"""Audio I/O tests (reference: audio.rs semantics; its golden test
audio.rs:44-70 depends on a missing sample.wav, so we pin equivalent
invariants on the bundled samples + synthetic roundtrips)."""

import os
import struct

import numpy as np
import pytest

from msv_tpu.io.audio import (
    _parse_wav_numpy,
    open_audio_file,
    open_audio_file_ex,
    write_wav,
)
from msv_tpu.utils.errors import AudioReadError


def test_roundtrip_pcm16(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 1000)) * 0.5, -0.99, 0.99).astype(
        np.float32
    )
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 16000, bits=16)
    wav, sr = open_audio_file(p)
    assert sr == 16000
    assert wav.shape == (2, 1000)
    # PCM16 quantization: 1/2^15 steps
    np.testing.assert_allclose(wav, x, atol=1.0 / 32768)


def test_roundtrip_float32(tmp_path, rng):
    x = (rng.standard_normal((1, 500)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 8000, bits=32)
    wav, sr = open_audio_file(p)
    np.testing.assert_array_equal(wav, x)  # float passthrough (audio.rs:15)


def test_pcm16_mono_exposes_raw_i16(tmp_path, rng):
    x = (rng.standard_normal((1, 300)) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 8000, bits=16)
    wav, sr, raw = open_audio_file_ex(p)
    assert raw is not None and raw.dtype == np.int16
    np.testing.assert_array_equal(
        raw.astype(np.float32) / np.float32(32768.0), wav[0]
    )
    # stereo does not expose the fast path
    write_wav(p, np.vstack([x, x]), 8000, bits=16)
    _, _, raw2 = open_audio_file_ex(p)
    assert raw2 is None


def test_int_normalization_semantics():
    # audio.rs:15-19: int PCM normalized by 2^(bits-1)
    hdr = b"RIFF" + struct.pack("<I", 36 + 4) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    hdr += b"data" + struct.pack("<I", 4)
    data = hdr + struct.pack("<hh", -32768, 16384)
    wav, sr, _ = _parse_wav_numpy(data, "mem")
    np.testing.assert_allclose(wav[0], [-1.0, 0.5])


def test_reference_samples_decode(reference_sample_paths):
    for p, sr_expect in zip(
        reference_sample_paths, [8000, 16000, 22050, 24000, 44100]
    ):
        wav, sr = open_audio_file(p)
        assert sr == sr_expect, p
        assert wav.shape[0] == 1  # mono clips
        sec = wav.shape[1] / sr
        assert 43.5 < sec < 44.5  # same 44.03 s clip at every rate
        assert np.abs(wav).max() <= 1.0


def test_native_decoder_parity(tmp_path, rng):
    """C++ decoder output must equal the numpy parser bit-for-bit."""
    from msv_tpu.io import _native_audio

    if _native_audio._load() is None:
        pytest.skip("native decoder not built (make -C msv_tpu/native)")
    for bits, ch in [(16, 1), (16, 2), (32, 1)]:
        x = (rng.standard_normal((ch, 777)) * 0.7).astype(np.float32)
        p = str(tmp_path / f"t{bits}_{ch}.wav")
        write_wav(p, x, 22050, bits=bits)
        native = _native_audio.try_decode(p)
        assert native is not None
        with open(p, "rb") as f:
            ref_wav, ref_sr, _ = _parse_wav_numpy(f.read(), p)
        np.testing.assert_array_equal(native[0], ref_wav)
        assert native[1] == ref_sr


def test_error_paths(tmp_path):
    with pytest.raises(AudioReadError):
        open_audio_file(str(tmp_path / "missing.wav"))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFFxxxxWAVEjunkjunk")
    with pytest.raises(AudioReadError):
        open_audio_file(str(bad))
    notwav = tmp_path / "x.txt"
    notwav.write_bytes(b"hello world, definitely not audio")
    with pytest.raises(AudioReadError):
        open_audio_file(str(notwav))


def test_decode_edge_cases(tmp_path):
    # directory path
    with pytest.raises(AudioReadError):
        open_audio_file(str(tmp_path))
    # empty file
    p = tmp_path / "empty.wav"
    p.write_bytes(b"")
    with pytest.raises(AudioReadError):
        open_audio_file(str(p))
    # truncated header
    p2 = tmp_path / "trunc.wav"
    p2.write_bytes(b"RIFF\x04\x00\x00\x00WA")
    with pytest.raises(AudioReadError):
        open_audio_file(str(p2))


def test_reference_sample_decode_golden(reference_sample_paths):
    """Pinned decode values for sample_8k.wav (the analogue of the
    reference's open_audio_works golden, audio.rs:44-70, whose own fixture
    is missing at v0; these were captured from this decoder and protect
    against normalization regressions)."""
    wav, sr = open_audio_file(reference_sample_paths[0])
    assert sr == 8000
    assert wav.max() == pytest.approx(0.21435547, abs=1e-7)
    assert wav.min() == pytest.approx(-0.20217896, abs=1e-7)
    # PCM16 values are exact multiples of 2^-15
    assert float(wav[0, 1006]) == pytest.approx(3.0517578e-05, abs=1e-12)


def test_mono_ex_integer_sum_stereo(tmp_path, rng):
    """Multi-channel PCM16: open_audio_mono_ex returns the EXACT int32
    channel sum, and the f32 mono equals sum(scaled channels) bit-for-bit
    (integer*2^-15 is exactly representable, so the integer-domain wire
    format is lossless vs the reference's f32 sum, lib.rs:42)."""
    from msv_tpu.io.audio import open_audio_file, open_audio_mono_ex

    x = np.clip(rng.standard_normal((2, 5000)) * 0.4, -1, 0.99).astype(
        np.float32
    )
    p = str(tmp_path / "st.wav")
    write_wav(p, x, 16000)

    mono, sr, raw, shift, _nch = open_audio_mono_ex(p)
    assert sr == 16000 and raw is not None and raw.dtype == np.int32
    assert shift == 15

    wav2d, sr2 = open_audio_file(p)
    expect = wav2d.sum(axis=0)
    np.testing.assert_array_equal(mono, expect)
    np.testing.assert_array_equal(
        raw.astype(np.float32) * np.float32(2.0**-15), mono
    )


def test_mono_ex_mono_keeps_i16(tmp_path, rng):
    from msv_tpu.io.audio import open_audio_mono_ex

    x = (rng.standard_normal((1, 3000)) * 0.3).astype(np.float32)
    p = str(tmp_path / "m.wav")
    write_wav(p, x, 8000)
    mono, sr, raw, shift, _nch = open_audio_mono_ex(p)
    assert raw is not None and raw.dtype == np.int16 and shift == 15
    np.testing.assert_array_equal(
        raw.astype(np.float32) * np.float32(2.0**-15), mono
    )


def test_mono_ex_float_source_no_raw(tmp_path, rng):
    """Full-entropy mono float (mantissas span >31 fractional bits): no
    integer carrier is possible; the loader must say so."""
    from msv_tpu.io.audio import open_audio_mono_ex

    x = (rng.standard_normal((1, 2000)) * 0.3).astype(np.float32)
    p = str(tmp_path / "f.wav")
    write_wav(p, x, 8000, bits=32)
    mono, sr, raw, shift, _nch = open_audio_mono_ex(p)
    assert raw is None and shift == 0
    np.testing.assert_array_equal(mono, x[0])


def test_mono_ex_float_sum_detected_scaled_int(tmp_path, rng):
    """Stereo float sums land on a dyadic grid (f32 addition), so the
    loader may detect an integer carrier — if it does, carrier * 2^-shift
    must reproduce the f32 sum BIT-exactly."""
    from msv_tpu.io.audio import open_audio_mono_ex

    x = (rng.standard_normal((2, 2000)) * 0.3).astype(np.float32)
    p = str(tmp_path / "f2.wav")
    write_wav(p, x, 8000, bits=32)
    mono, sr, raw, shift, _nch = open_audio_mono_ex(p)
    expect = x[0] + x[1]
    np.testing.assert_array_equal(mono, expect)
    if raw is not None:
        back = raw.astype(np.float32) * np.float32(2.0**-shift)
        np.testing.assert_array_equal(
            back.view(np.uint32), expect.view(np.uint32)
        )


def test_detect_scaled_int_cases(rng):
    """detect_scaled_int: minimal shift, exact carriers, honest rejections."""
    from msv_tpu.io.audio import detect_scaled_int

    # int16-origin floats -> s=15, int16 carrier
    k = rng.integers(-32768, 32768, 4000).astype(np.int32)
    x = (k.astype(np.float32) / np.float32(32768.0)).astype(np.float32)
    det = detect_scaled_int(x)
    assert det is not None and det[1] == 15 and det[0].dtype == np.int16
    np.testing.assert_array_equal(det[0], k)

    # 24-bit-origin floats -> s=23, int32 carrier
    k24 = rng.integers(-(1 << 23), 1 << 23, 4000)
    x24 = (k24.astype(np.float32) / np.float32(1 << 23)).astype(np.float32)
    det = detect_scaled_int(x24)
    assert det is not None and det[1] == 23 and det[0].dtype == np.int32
    np.testing.assert_array_equal(det[0], k24)

    # minimal shift: multiples of 0.25 -> s=2
    xq = (rng.integers(-40, 40, 3000).astype(np.float32) / 4.0).astype(np.float32)
    det = detect_scaled_int(xq)
    assert det is not None and det[1] == 2

    # all zeros -> s=0
    det = detect_scaled_int(np.zeros(100, np.float32))
    assert det is not None and det[1] == 0 and not det[0].any()

    # full-entropy floats: rejected
    assert detect_scaled_int(rng.standard_normal(3000).astype(np.float32)) is None
    # denormals / inf / nan: rejected
    assert detect_scaled_int(np.array([1e-44], np.float32)) is None
    assert detect_scaled_int(np.array([np.inf, 1.0], np.float32)) is None
    assert detect_scaled_int(np.array([np.nan], np.float32)) is None

    # bit-exact reconstruction contract on every accepted case
    for sig in (x, x24, xq):
        v, s = detect_scaled_int(sig)
        back = v.astype(np.float32) * np.float32(2.0**-s)
        np.testing.assert_array_equal(
            back.view(np.uint32), sig.view(np.uint32)
        )


def test_detect_scaled_int_chunk_boundaries(rng):
    """The chunked scan (1M-sample chunks) must agree with the whole-array
    semantics when the deciding evidence sits in a LATER chunk."""
    from msv_tpu.io.audio import detect_scaled_int

    C = 1 << 20
    # first chunk all zeros, shift evidence only in chunk 2
    x = np.zeros(C + 4096, np.float32)
    k = rng.integers(-32768, 32768, 4096).astype(np.int32)
    x[C:] = k.astype(np.float32) / np.float32(32768.0)
    det = detect_scaled_int(x)
    assert det is not None and det[1] == 15
    np.testing.assert_array_equal(det[0][C:], k)
    assert not det[0][:C].any()

    # shift grows across chunks (s=2 in chunk 1, s=15 in chunk 2)
    x2 = np.empty(C + 4096, np.float32)
    x2[:C] = rng.integers(-40, 40, C).astype(np.float32) / 4.0
    x2[C:] = k.astype(np.float32) / np.float32(32768.0)
    det = detect_scaled_int(x2)
    assert det is not None and det[1] == 15
    back = det[0].astype(np.float32) * np.float32(2.0 ** -det[1])
    np.testing.assert_array_equal(back.view(np.uint32), x2.view(np.uint32))

    # rejection evidence only in a later chunk: inf / denormal single
    # values, and full-entropy float content
    for bad in (np.inf, 1e-44):
        x3 = np.zeros(C + 8, np.float32)
        x3[C + 3] = bad
        assert detect_scaled_int(x3) is None
    x3 = np.zeros(C + 3000, np.float32)
    x3[C:] = rng.standard_normal(3000).astype(np.float32)
    assert detect_scaled_int(x3) is None

    # int32-range overflow where amax sits in chunk 1 but the max shift
    # only appears in chunk 2: 2.0 * 2^31 overflows int32 -> reject
    x4 = np.zeros(C + 4096, np.float32)
    x4[0] = 2.0
    x4[C:] = k.astype(np.float32) / np.float32(2.0**31)
    assert detect_scaled_int(x4) is None


def test_detect_scaled_int_int16_range_is_asymmetric():
    """Full-scale int16-origin floats: exactly -1.0 (= -32768/2^15) still
    fits the int16 carrier; +32768-equivalent must widen to int32."""
    from msv_tpu.io.audio import detect_scaled_int

    x = np.array([-1.0, 0.5, 0.999969482421875], np.float32)  # k/2^15
    v, s = detect_scaled_int(x)
    assert s == 15 and v.dtype == np.int16
    np.testing.assert_array_equal(v, [-32768, 16384, 32767])

    # +1.0 at shift 15 (forced by the 1/2^15 sample) overflows int16
    x2 = np.array([1.0, 2.0**-15], np.float32)
    v2, s2 = detect_scaled_int(x2)
    assert s2 == 15 and v2.dtype == np.int32
    np.testing.assert_array_equal(v2, [32768, 1])


def test_wav_24bit_gets_integer_carrier(tmp_path, rng):
    """24-bit PCM WAV: the mono f32 is k/2^23, detected as a scaled int ->
    integer wire path with shift 23 (exact)."""
    import struct as _struct

    from msv_tpu.io.audio import open_audio_mono_ex

    k = rng.integers(-(1 << 23), 1 << 23, 3000)
    b = np.zeros((3000, 3), np.uint8)
    ku = (k & 0xFFFFFF).astype(np.uint32)
    b[:, 0] = ku & 0xFF
    b[:, 1] = (ku >> 8) & 0xFF
    b[:, 2] = (ku >> 16) & 0xFF
    raw24 = b.tobytes()
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(raw24)) + b"WAVE"
    hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, 16000, 48000, 3, 24)
    hdr += b"data" + _struct.pack("<I", len(raw24))
    p = str(tmp_path / "w24.wav")
    with open(p, "wb") as f:
        f.write(hdr + raw24)

    mono, sr, raw, shift, _nch = open_audio_mono_ex(p)
    assert sr == 16000 and raw is not None and shift == 23
    np.testing.assert_array_equal(raw, k)
    np.testing.assert_array_equal(
        raw.astype(np.float32) * np.float32(2.0**-23), mono
    )


def test_wav_decode_cross_validated_against_scipy(tmp_path, rng,
                                                  reference_sample_paths):
    """INDEPENDENT oracle for the WAV parser (PARITY.md: the numpy and
    C++ parsers are both ours): scipy.io.wavfile is a separate codebase.
    Ours normalizes int PCM by 2^(bits-1) (audio.rs:15-19); scipy returns
    raw integers (u8 offset-binary for 8-bit), so normalize scipy's view
    the same way and demand exact equality."""
    import scipy.io.wavfile as sw

    def scipy_norm(path):
        sr, data = sw.read(path)
        if data.dtype == np.uint8:
            x = (data.astype(np.int16) - 128).astype(np.float32) / 128.0
        elif data.dtype == np.int16:
            x = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            x = data.astype(np.float32) / 2147483648.0
        else:
            x = data.astype(np.float32)
        return sr, (x[None, :] if x.ndim == 1 else x.T)

    # every bundled reference sample
    for p in reference_sample_paths:
        wav, sr = open_audio_file(p)
        sr2, expect = scipy_norm(p)
        assert sr == sr2
        np.testing.assert_array_equal(wav, expect, err_msg=p)

    # synthetic PCM16 stereo + float32 mono
    x = np.clip(rng.standard_normal((2, 700)) * 0.5, -0.99, 0.99).astype(
        np.float32
    )
    p16 = str(tmp_path / "s16.wav")
    write_wav(p16, x, 22050, bits=16)
    wav, sr = open_audio_file(p16)
    sr2, expect = scipy_norm(p16)
    np.testing.assert_array_equal(wav, expect)

    pf = str(tmp_path / "f32.wav")
    write_wav(pf, x[:1], 8000, bits=32)
    wav, sr = open_audio_file(pf)
    sr2, expect = scipy_norm(pf)
    np.testing.assert_array_equal(wav, expect)
