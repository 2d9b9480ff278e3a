"""FLAC + Ogg/Vorbis decoding (reference: rodio fallback, audio.rs:23-30).

FLAC: the native C++ decoder (msv_tpu/native/flac_decoder.cc) is exercised
against the spec-conformant Python encoder (io/flac_encode.py) across every
subframe type, stereo decorrelation mode, Rice partitioning variant, and
bit depth — plus committed fixtures so the tests run without the encoder.

Vorbis: ctypes bindings to the system libvorbisfile, validated on committed
fixtures produced by the system libvorbisenc (tools/make_ogg_fixture.py)
and on a real-world third-party file when present.
"""

import os

import numpy as np
import pytest

from msv_tpu.io._native_audio import decode_flac, flac_available
from msv_tpu.io._vorbis import available as vorbis_available
from msv_tpu.io.audio import open_audio_file
from msv_tpu.io.flac_encode import encode_flac, write_flac
from msv_tpu.utils.errors import AudioReadError

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

pytestmark = pytest.mark.skipif(
    not flac_available(), reason="libmsv_native.so not built"
)


def _pcm16(rng, shape, amp=8000):
    return np.clip(rng.standard_normal(shape) * amp, -32768, 32767).astype(
        np.int64
    )


def _roundtrip(tmp_path, pcm, sr, bps=16, **kw):
    path = str(tmp_path / "t.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, sr, bps=bps, **kw))
    wav, got_sr = decode_flac(path)
    lim = 1 << (bps - 1)
    assert got_sr == sr
    assert wav.shape == pcm.shape
    np.testing.assert_array_equal(wav, pcm.astype(np.float32) / lim)
    return path


@pytest.mark.parametrize("mode", [
    "verbatim", "fixed0", "fixed1", "fixed2", "fixed3", "fixed4",
    "lpc1", "lpc2", "lpc4",
])
def test_flac_subframe_modes(tmp_path, rng, mode):
    pcm = _pcm16(rng, (1, 1000))
    _roundtrip(tmp_path, pcm, 8000, mode=mode)


def test_flac_constant(tmp_path):
    _roundtrip(tmp_path, np.full((1, 500), -123, np.int64), 8000,
               mode="constant")


@pytest.mark.parametrize("stereo_mode", [
    "independent", "left_side", "right_side", "mid_side",
])
def test_flac_stereo_decorrelation(tmp_path, rng, stereo_mode):
    pcm = _pcm16(rng, (2, 777))
    _roundtrip(tmp_path, pcm, 44100, mode="fixed2", stereo_mode=stereo_mode)


def test_flac_rice_partitions_and_escape(tmp_path, rng):
    pcm = _pcm16(rng, (1, 1024))
    _roundtrip(tmp_path, pcm, 16000, mode="fixed2", partition_order=3,
               blocksize=256)
    _roundtrip(tmp_path, pcm, 16000, mode="fixed1", force_escape=True)


def test_flac_wasted_bits(tmp_path, rng):
    pcm = _pcm16(rng, (1, 600)) & ~np.int64(7)
    _roundtrip(tmp_path, pcm, 8000, mode="fixed2", wasted_bits=3)


@pytest.mark.parametrize("bps,amp", [(8, 100), (16, 20000), (24, 2**22)])
def test_flac_bit_depths(tmp_path, rng, bps, amp):
    lim = 1 << (bps - 1)
    pcm = np.clip(rng.standard_normal((1, 400)) * amp, -lim, lim - 1).astype(
        np.int64
    )
    _roundtrip(tmp_path, pcm, 48000, bps=bps,
               mode="verbatim" if bps == 8 else "fixed2")


def test_flac_short_tail_frame(tmp_path, rng):
    # 300 samples @ blocksize 256 -> 44-sample tail frame
    pcm = _pcm16(rng, (1, 300))
    _roundtrip(tmp_path, pcm, 8000, mode="fixed2", blocksize=256)


def test_flac_corrupt_rejected(tmp_path, rng):
    pcm = _pcm16(rng, (1, 500))
    data = bytearray(encode_flac(pcm, 8000, mode="fixed2"))
    data[len(data) // 2] ^= 0xFF  # flip bits mid-frame
    path = str(tmp_path / "bad.flac")
    with open(path, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(AudioReadError):
        from msv_tpu.io.audio import open_audio_file_ex

        open_audio_file_ex(path)


def test_flac_fixture_dispatch():
    """Committed fixture decodes through the magic-byte dispatcher."""
    wav, sr = open_audio_file(os.path.join(FIXTURES, "sine440_8k.flac"))
    assert sr == 8000 and wav.shape == (1, 4000)
    t = np.arange(wav.shape[1]) / sr
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    # 16-bit quantization only
    np.testing.assert_allclose(wav[0], ref, atol=1.0 / (1 << 15))


def test_flac_stereo_fixture():
    wav, sr = open_audio_file(
        os.path.join(FIXTURES, "duotone_8k_stereo.flac"))
    assert sr == 8000 and wav.shape == (2, 2400)
    t = np.arange(2400) / 8000
    np.testing.assert_allclose(
        wav[0], 0.5 * np.sin(2 * np.pi * 440.0 * t), atol=1.0 / (1 << 15))
    np.testing.assert_allclose(
        wav[1], 0.3 * np.sin(2 * np.pi * 660.0 * t), atol=1.0 / (1 << 15))


def test_flac_in_session(tmp_path, rng):
    """A .flac track goes through the full spectrogram pipeline."""
    from msv_tpu import MultiTrack

    sr = 8000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 500.0 * t)).astype(np.float32)[None, :]
    path = str(tmp_path / "tone.flac")
    write_flac(path, wav, sr, mode="fixed2")
    mt = MultiTrack()
    mt.add_tracks([0], [path])
    img = mt.get_spec_image(0, 50.0, 100)
    assert img.shape[2] == 3 and img.shape[0] == 100


# ---------------------------------------------------------------- vorbis ----

needs_vorbis = pytest.mark.skipif(
    not vorbis_available(), reason="libvorbisfile not present"
)


@needs_vorbis
def test_vorbis_mono_fixture():
    wav, sr = open_audio_file(os.path.join(FIXTURES, "sine440_8k.ogg"))
    assert sr == 8000 and wav.shape == (1, 4000)
    t = np.arange(wav.shape[1]) / sr
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    # lossy codec: require high correlation + similar scale, skip the
    # encoder's warmup transient
    corr = np.corrcoef(wav[0][500:], ref[500:])[0, 1]
    assert corr > 0.99
    assert 0.3 < np.abs(wav[0][500:]).max() < 0.8


@needs_vorbis
def test_vorbis_stereo_fixture():
    wav, sr = open_audio_file(
        os.path.join(FIXTURES, "duotone_8k_stereo.ogg"))
    assert sr == 8000 and wav.shape[0] == 2
    t = np.arange(wav.shape[1]) / sr
    c0 = np.corrcoef(wav[0][500:], np.sin(2 * np.pi * 440.0 * t)[500:])[0, 1]
    c1 = np.corrcoef(wav[1][500:], np.sin(2 * np.pi * 660.0 * t)[500:])[0, 1]
    assert c0 > 0.98 and c1 > 0.98  # channel order preserved


@needs_vorbis
def test_vorbis_real_world_file():
    """Third-party file (pygame sample) — not produced by our tooling."""
    path = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"
    if not os.path.exists(path):
        pytest.skip("pygame sample not present")
    wav, sr = open_audio_file(path)
    assert sr == 11025 and wav.shape == (1, 78331)
    assert np.isfinite(wav).all() and np.abs(wav).max() > 0.5


@needs_vorbis
def test_vorbis_garbage_rejected(tmp_path):
    path = str(tmp_path / "junk.ogg")
    with open(path, "wb") as f:
        f.write(b"OggS" + b"\x00" * 64)
    with pytest.raises(AudioReadError):
        open_audio_file(path)


def test_flac_integer_domain_loader(tmp_path, rng):
    """open_audio_mono_ex on FLAC: exact integer channel sum in 2^-15
    units, equal to the f32 mono bit-for-bit (the session wire path)."""
    from msv_tpu.io.audio import open_audio_mono_ex

    pcm = _pcm16(rng, (2, 3000))
    path = str(tmp_path / "st.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, 16000, mode="fixed2", stereo_mode="mid_side"))
    mono, sr, raw, shift, _nch = open_audio_mono_ex(path)
    assert sr == 16000 and raw is not None and raw.dtype == np.int32
    assert shift == 15
    np.testing.assert_array_equal(raw, pcm.sum(axis=0))
    np.testing.assert_array_equal(
        raw.astype(np.float32) * np.float32(2.0**-15), mono
    )


def test_flac_8bit_integer_rescale(tmp_path, rng):
    from msv_tpu.io.audio import open_audio_mono_ex

    pcm = np.clip(rng.standard_normal((1, 2000)) * 40, -128, 127).astype(
        np.int64
    )
    path = str(tmp_path / "m8.flac")
    with open(path, "wb") as f:
        f.write(encode_flac(pcm, 8000, bps=8, mode="verbatim"))
    mono, sr, raw, shift, _nch = open_audio_mono_ex(path)
    assert raw is not None and shift == 15
    np.testing.assert_array_equal(raw, pcm[0] << 8)  # 2^-15 units
    np.testing.assert_array_equal(
        raw.astype(np.float32) * np.float32(2.0**-15), mono
    )


# ------------------------------------------------------------------- mp3 ----

from msv_tpu.io._mp3 import available as mp3_available  # noqa: E402

needs_mp3 = pytest.mark.skipif(
    not mp3_available(), reason="libmpg123 not present"
)


@needs_mp3
def test_mp3_mono_fixture():
    """lame-encoded 440 Hz tone (tools/make_mp3_fixture.py): gapless decode
    is sample-count-exact and the interior waveform tracks the source."""
    wav, sr = open_audio_file(os.path.join(FIXTURES, "sine440_16k.mp3"))
    assert sr == 16000 and wav.shape == (1, 12800)
    t = np.arange(wav.shape[1], dtype=np.float32) / np.float32(sr)
    ref = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    err = wav[0][1152:-1152] - ref[1152:-1152]
    assert np.sqrt((err**2).mean()) < 0.05  # measured 0.018 (MPEG-2 @16k)
    assert np.abs(err).max() < 0.1  # measured 0.025


@needs_mp3
def test_mp3_stereo_fixture():
    wav, sr = open_audio_file(
        os.path.join(FIXTURES, "duotone_44k1_stereo.mp3"))
    assert sr == 44100 and wav.shape == (2, 26460)
    t = np.arange(wav.shape[1], dtype=np.float64) / sr
    refs = [0.4 * np.sin(2 * np.pi * 523.25 * t),
            0.4 * np.sin(2 * np.pi * 659.25 * t)]
    for ch in range(2):  # channel order preserved; 44.1k MPEG-1 is tight
        err = wav[ch][1152:-1152] - refs[ch][1152:-1152]
        assert np.abs(err).max() < 0.01, ch  # measured 1.6e-4


@needs_mp3
def test_mp3_roundtrip_via_lame(tmp_path, rng):
    """Encode with the system libmp3lame at test time, decode back:
    sample-count-exact (Xing gapless tags honored) and waveform-close."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(FIXTURES), "..", "tools"))
    try:
        from make_mp3_fixture import encode_mp3
    except Exception:
        pytest.skip("libmp3lame not usable")
    sr = 32000
    t = np.arange(sr, dtype=np.float32) / np.float32(sr)
    src = np.stack([
        0.3 * np.sin(2 * np.pi * 330.0 * t),
        0.3 * np.sin(2 * np.pi * 880.0 * t),
    ]).astype(np.float32)
    path = str(tmp_path / "rt.mp3")
    with open(path, "wb") as f:
        f.write(encode_mp3(src, sr))
    wav, got_sr = open_audio_file(path)
    assert got_sr == sr and wav.shape == src.shape
    err = wav[:, 2304:-2304] - src[:, 2304:-2304]
    assert np.abs(err).max() < 0.02, np.abs(err).max()


@needs_mp3
def test_mp3_garbage_rejected(tmp_path):
    path = str(tmp_path / "junk.mp3")
    with open(path, "wb") as f:
        f.write(b"ID3" + b"\x00" * 64)  # tag with no audio frames
    with pytest.raises(AudioReadError):
        open_audio_file(path)


def test_mp3_magic_is_conservative(tmp_path):
    """Arbitrary binaries must not be claimed as mp3 by the dispatch."""
    from msv_tpu.io.audio import _looks_like_mp3

    assert _looks_like_mp3(b"ID3\x04\x00" + b"\x00" * 7)
    assert _looks_like_mp3(bytes([0xFF, 0xFB, 0xE0, 0x44] + [0] * 8))
    assert not _looks_like_mp3(b"\x7fELF" + b"\x00" * 8)  # ELF
    assert not _looks_like_mp3(bytes([0xFF, 0xFF, 0xFF, 0xFF] + [0] * 8))
    assert not _looks_like_mp3(bytes([0xFF, 0xFB, 0xF0, 0x44] + [0] * 8))
    assert not _looks_like_mp3(b"RIFFxxxxWAVE")


@needs_mp3
def test_mp3_in_session(tmp_path, rng):
    """An mp3 track renders through the full session pipeline."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(FIXTURES), "..", "tools"))
    from msv_tpu import MultiTrack

    mt = MultiTrack()
    mt.add_tracks([0], [os.path.join(FIXTURES, "sine440_16k.mp3")])
    img = mt.get_spec_image(0, 100.0, 120)
    assert img.shape[0] == 120 and img.shape[2] == 3 and img.shape[1] > 0


@pytest.mark.parametrize("modname", ["_mp3", "_vorbis", "_native_audio"])
def test_lazy_loader_thread_safety(monkeypatch, modname):
    """Concurrent first-touch from decoder threads must all see the same
    fully-initialized handle (regression: _TRIED was published before
    _LIB, so a racing thread returned None and the codec 'vanished' —
    found driving the data-pipeline thread pool)."""
    import concurrent.futures
    import importlib
    import threading

    mod = importlib.import_module(f"msv_tpu.io.{modname}")
    monkeypatch.setattr(mod, "_TRIED", False)
    monkeypatch.setattr(mod, "_LIB", None)
    barrier = threading.Barrier(8)

    def go(_):
        barrier.wait()
        return mod._load()

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(go, range(8)))
    assert all(r is results[0] for r in results)
