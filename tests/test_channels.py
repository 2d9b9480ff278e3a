"""Per-channel (stereo) track support.

The reference sums channels to mono unconditionally and marks the gap
(`lib.rs:42  // TODO: stereo support`).  Our ``channel=`` parameter on
the loader / AudioTrack / add_tracks / CLI / viewer implements that TODO
as a capability extension; ``channel=None`` keeps the reference's exact
sum-to-mono behavior (pinned elsewhere by the golden-digest e2e tests).
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from msv_tpu.io.audio import open_audio_file, open_audio_mono_ex, write_wav
from msv_tpu.utils.errors import AudioReadError


def _stereo(sr=8000, seconds=1.0, rng=None):
    """Two clearly different channels: 440 Hz left, 1700 Hz right."""
    t = np.arange(int(sr * seconds)) / sr
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.3 * np.sin(2 * np.pi * 1700 * t)
    if rng is not None:
        left = left + 0.01 * rng.standard_normal(len(t))
    return np.stack([left, right]).astype(np.float32)


# ---------------------------------------------------------------- loader


def test_wav_pcm16_channel_extraction(tmp_path):
    wav = _stereo()
    p = str(tmp_path / "st.wav")
    write_wav(p, wav, 8000)

    wav2d, _ = open_audio_file(p)
    for k in (0, 1):
        mono, sr, raw, shift, n_ch = open_audio_mono_ex(p, channel=k)
        assert sr == 8000 and n_ch == 2
        # PCM16 single channel rides the narrow int16 wire lane
        assert raw is not None and raw.dtype == np.int16 and shift == 15
        np.testing.assert_array_equal(
            raw.astype(np.float32) * np.float32(2.0**-15), wav2d[k]
        )
        np.testing.assert_array_equal(mono, wav2d[k])
    # the two channels genuinely differ
    a = open_audio_mono_ex(p, channel=0)[0]
    b = open_audio_mono_ex(p, channel=1)[0]
    assert not np.array_equal(a, b)


def test_wav_pcm16_channel_of_mono_is_identity(tmp_path):
    wav = _stereo()[:1]
    p = str(tmp_path / "m.wav")
    write_wav(p, wav, 8000)
    m_sum = open_audio_mono_ex(p)
    m_ch0 = open_audio_mono_ex(p, channel=0)
    np.testing.assert_array_equal(m_sum[2], m_ch0[2])
    assert m_sum[4] == m_ch0[4] == 1


def test_channel_out_of_range_raises(tmp_path):
    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    with pytest.raises(AudioReadError, match="channel 2 out of range"):
        open_audio_mono_ex(p, channel=2)
    with pytest.raises(AudioReadError, match="out of range"):
        open_audio_mono_ex(p, channel=-1)


def test_float_wav_channel_extraction(tmp_path, rng):
    """True-float stereo (noise): channel extraction on the f32 fallback
    path returns wav2d[k] exactly."""
    x = rng.standard_normal((2, 4000)).astype(np.float32) * 0.3
    p = str(tmp_path / "f.wav")
    write_wav(p, x, 16000, bits=32)
    wav2d, _ = open_audio_file(p)
    for k in (0, 1):
        mono, sr, raw, shift, n_ch = open_audio_mono_ex(p, channel=k)
        assert n_ch == 2
        np.testing.assert_array_equal(mono, wav2d[k])


def test_flac_channel_extraction(tmp_path):
    from msv_tpu.io.flac_encode import write_flac

    wav = _stereo(sr=16000)
    p = str(tmp_path / "st.flac")
    write_flac(p, wav, 16000)
    wav2d, _ = open_audio_file(p)
    for k in (0, 1):
        mono, sr, raw, shift, n_ch = open_audio_mono_ex(p, channel=k)
        assert sr == 16000 and n_ch == 2
        assert raw is not None and raw.dtype == np.int16 and shift == 15
        np.testing.assert_array_equal(
            raw.astype(np.float32) * np.float32(2.0**-15), wav2d[k]
        )
        np.testing.assert_array_equal(mono, wav2d[k])
    with pytest.raises(AudioReadError, match="out of range"):
        open_audio_mono_ex(p, channel=5)


def test_flac_24bit_channel_keeps_integer_carrier(tmp_path, rng):
    """17..25 bps FLAC: a single extracted channel ships the decoder's
    exact integers (shift bps-1) even for multichannel files — the old
    sum path only did this for mono sources."""
    from msv_tpu.io.flac_encode import write_flac

    k = rng.integers(-(1 << 23), 1 << 23, (2, 3000)).astype(np.int64)
    wav = (k.astype(np.float64) / (1 << 23)).astype(np.float32)
    p = str(tmp_path / "st24.flac")
    write_flac(p, wav, 16000, bps=24)
    for ch in (0, 1):
        mono, sr, raw, shift, n_ch = open_audio_mono_ex(p, channel=ch)
        assert shift == 23 and raw is not None and n_ch == 2
        np.testing.assert_array_equal(raw, k[ch])


# ---------------------------------------------------------------- session


def test_session_channel_view_matches_single_channel_file(tmp_path):
    """A channel=k track's spectrogram pixels equal those of a mono file
    holding only channel k (same global dB window forced by adding both
    to one session)."""
    from msv_tpu.session import MultiTrack

    wav = _stereo()
    p_st = str(tmp_path / "st.wav")
    p_l = str(tmp_path / "l.wav")
    p_r = str(tmp_path / "r.wav")
    write_wav(p_st, wav, 8000)
    write_wav(p_l, wav[:1], 8000)
    write_wav(p_r, wav[1:], 8000)

    mt = MultiTrack()
    mt.add_tracks([0, 1, 2, 3], [p_st, p_st, p_l, p_r],
                  channels=[0, 1, None, None])
    assert mt.get_channel(0) == 0 and mt.get_channel(1) == 1
    assert mt.get_n_channels(0) == 2 and mt.get_n_channels(2) == 1
    img_l = mt.get_spec_image(0, 50, 100)
    img_r = mt.get_spec_image(1, 50, 100)
    np.testing.assert_array_equal(img_l, mt.get_spec_image(2, 50, 100))
    np.testing.assert_array_equal(img_r, mt.get_spec_image(3, 50, 100))
    assert not np.array_equal(img_l, img_r)
    # waveform envelopes follow the channel too
    wl = mt.get_wav_image(0, 50, 60, -1.0, 1.0)
    np.testing.assert_array_equal(wl, mt.get_wav_image(2, 50, 60, -1.0, 1.0))


def test_session_default_is_sum_to_mono(tmp_path):
    """channels omitted == channels=[None] == the reference's mono sum."""
    from msv_tpu.session import MultiTrack

    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    mt_a = MultiTrack()
    mt_a.add_tracks([0], [p])
    mt_b = MultiTrack()
    mt_b.add_tracks([0], [p], channels=[None])
    np.testing.assert_array_equal(
        mt_a.get_spec_image(0, 50, 100), mt_b.get_spec_image(0, 50, 100)
    )
    assert mt_a.get_channel(0) is None


def test_set_setting_preserves_channel(tmp_path):
    from msv_tpu.config import SpecSetting
    from msv_tpu.session import MultiTrack

    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    mt = MultiTrack()
    mt.add_tracks([0], [p], channels=[1])
    import dataclasses

    mt.set_setting(dataclasses.replace(SpecSetting(), win_ms=30.0))
    assert mt.get_channel(0) == 1


def test_save_load_session_roundtrips_channel(tmp_path):
    from msv_tpu.session import MultiTrack

    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    mt = MultiTrack()
    mt.add_tracks([0, 1], [p, p], channels=[None, 1])
    sess = str(tmp_path / "s.json")
    mt.save_session(sess)
    mt2 = MultiTrack.load_session(sess)
    assert mt2.get_channel(0) is None and mt2.get_channel(1) == 1
    np.testing.assert_array_equal(
        mt.get_spec_image(1, 50, 100), mt2.get_spec_image(1, 50, 100)
    )


def test_load_v1_session_manifest(tmp_path):
    """Pre-channel manifests (tracks: {id: path-string}) still load."""
    from msv_tpu.session import MultiTrack

    p = str(tmp_path / "a.wav")
    write_wav(p, _stereo()[:1], 8000)
    manifest = {
        "version": 1,
        "setting": {"win_ms": 40.0, "t_overlap": 4, "f_overlap": 1,
                    "freq_scale": "mel", "db_range": 120.0},
        "tracks": {"0": p},
        "max_db": None, "min_db": None,
    }
    sess = str(tmp_path / "v1.json")
    with open(sess, "w") as f:
        json.dump(manifest, f)
    mt = MultiTrack.load_session(sess)
    assert mt.get_channel(0) is None and mt.get_sr(0) == 8000


# ---------------------------------------------------------------- viewer


def test_viewer_channel_endpoint(tmp_path):
    from http.server import ThreadingHTTPServer

    from msv_tpu.session import MultiTrack
    from msv_tpu.viewer import _Handler, _RWLock

    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    mt = MultiTrack()
    mt.add_tracks([0], [p])
    handler = type("H", (_Handler,), {"session": mt, "lock": _RWLock()})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def get(path):
            with urllib.request.urlopen(url + path, timeout=30) as r:
                return r.status, r.read()

        def post(path, payload):
            req = urllib.request.Request(
                url + path, data=json.dumps(payload).encode(), method="POST"
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status, json.loads(r.read())

        _, body = get("/api/tracks")
        t = json.loads(body)["tracks"][0]
        assert t["n_channels"] == 2 and t["channel"] is None

        _, png_mix = get("/api/spec/0?px_per_sec=50&height=100")
        code, d = post("/api/channel", {"id": 0, "channel": 1})
        assert code == 200 and d["ok"]
        _, body = get("/api/tracks")
        assert json.loads(body)["tracks"][0]["channel"] == 1
        _, png_r = get("/api/spec/0?px_per_sec=50&height=100")
        assert png_r != png_mix  # pixels actually changed

        # back to the mix (channel: null)
        code, d = post("/api/channel", {"id": 0, "channel": None})
        assert code == 200
        _, png_mix2 = get("/api/spec/0?px_per_sec=50&height=100")
        assert png_mix2 == png_mix

        # out-of-range channel -> clean 500, session untouched
        with pytest.raises(urllib.error.HTTPError) as e:
            post("/api/channel", {"id": 0, "channel": 7})
        assert e.value.code == 500
        assert b"out of range" in e.value.read()
        _, body = get("/api/tracks")
        assert json.loads(body)["tracks"][0]["channel"] is None

        # unknown track id -> clean 500 naming the track
        with pytest.raises(urllib.error.HTTPError) as e:
            post("/api/channel", {"id": 42, "channel": 0})
        assert e.value.code == 500
        # channel selector appears in the client page
        _, page = get("/")
        assert b"data-chsel" in page
    finally:
        srv.shutdown()


# ------------------------------------------------------------------- CLI


def test_cli_render_channel(tmp_path):
    from msv_tpu.cli import main

    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    out = tmp_path / "out"
    rc = main(["render", p, "-o", str(out), "--channel", "1",
               "--px-per-sec", "40", "--height", "80", "--no-wav"])
    assert rc == 0
    assert (out / "spec_st_ch1.png").exists()
    rc = main(["render", p, "-o", str(out), "--channel", "9"])
    assert rc == 1  # clean error, not a traceback


def test_cli_render_adaptive_channel(tmp_path):
    from msv_tpu.cli import main

    p = str(tmp_path / "st.wav")
    write_wav(p, _stereo(), 8000)
    out = tmp_path / "out"
    rc = main(["render", p, "-o", str(out), "--adaptive", "--channel", "0",
               "--px-per-sec", "40", "--height", "80"])
    assert rc == 0
    assert (out / "spec_adaptive_st_ch0.png").exists()
