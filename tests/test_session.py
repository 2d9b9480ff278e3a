"""MultiTrack session tests (reference: lib.rs:72-365, multitrack_works
lib.rs:516-546 — but with real assertions instead of eyeball PNGs,
fixing the reference's weakest point per SURVEY.md §4)."""

import os

import numpy as np
import pytest

from msv_tpu import FreqScale, MultiTrack, SpecSetting
from msv_tpu.io.audio import write_wav
from msv_tpu.utils.errors import TrackNotFoundError


@pytest.fixture()
def wav_dir(tmp_path, rng):
    """Synthetic multi-rate fixtures: chirp + tone, 0.5 s each."""
    paths = {}
    for sr in [8000, 16000, 24000]:
        t = np.arange(int(sr * 0.5)) / sr
        x = 0.5 * np.sin(2 * np.pi * (200 + 400 * t) * t) + 0.1 * rng.standard_normal(
            len(t)
        )
        p = str(tmp_path / f"tone_{sr}.wav")
        write_wav(p, x.astype(np.float32)[None, :], sr)
        paths[sr] = p
    return paths


def test_add_tracks_and_state(wav_dir):
    mt = MultiTrack()
    changed = mt.add_tracks([0, 1, 2], [wav_dir[8000], wav_dir[16000], wav_dir[24000]])
    assert changed  # first add always changes the dB range
    assert mt.max_sr == 24000
    assert mt.get_sr(1) == 16000
    assert mt.get_sec(0) == pytest.approx(0.5, abs=1e-3)
    assert mt.get_max_sec() == pytest.approx(0.5, abs=1e-3)
    # dB window invariants (lib.rs:208-209)
    assert mt.get_max_db() <= 0.0
    assert mt.get_min_db() >= mt.get_max_db() - 120.0
    assert mt.get_filename(2).endswith("tone_24000.wav")
    assert mt.get_path(2) == wav_dir[24000]


def test_spec_image_shapes_and_content(wav_dir):
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    img = mt.get_spec_image(0, 100.0, 200)
    # nwidth = trunc(100 * 0.5) = 50
    assert img.shape == (200, 50, 3)
    assert img.dtype == np.uint8
    # a chirp must produce non-constant output
    assert img.std() > 1.0
    # raw bytes form (reference returns Vec<u8>)
    assert img.tobytes() == np.asarray(img).tobytes()


def test_wav_image_shapes(wav_dir):
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    img = mt.get_wav_image(0, 100.0, 120, -1.0, 1.0)
    assert img.shape == (120, 50, 4)
    assert (img[:, :, 3] > 0).any()


def test_grey_alignment_multirate(wav_dir):
    """Tracks with lower sr get zero rows on top (display.rs:44-54) scaled
    by the mel up_ratio (lib.rs:238-247)."""
    mt = MultiTrack()
    mt.add_tracks([0, 1], [wav_dir[8000], wav_dir[24000]])
    g8 = mt.get_grey(0)
    g24 = mt.get_grey(1)
    from msv_tpu.ops.mel import hz_to_mel

    f32 = np.float32
    up8 = float(hz_to_mel(f32(12000.0)) / hz_to_mel(f32(4000.0)))
    n_out8 = mt.mel_fbs[8000].shape[1]
    assert g8.shape[0] == int(np.floor(np.float32(n_out8) * np.float32(up8) + 0.5))
    n_out24 = mt.mel_fbs[24000].shape[1]
    assert g24.shape[0] == n_out24  # up_ratio 1 for the max-sr track
    # top pad rows of the low-rate track are exactly zero
    pad_rows = g8.shape[0] - n_out8
    assert pad_rows > 0
    assert np.all(g8[:pad_rows] == 0.0)
    assert g8.min() >= 0.0 and g8.max() <= 1.0


def test_remove_track_bookkeeping(wav_dir):
    mt = MultiTrack()
    mt.add_tracks([0, 1], [wav_dir[8000], wav_dir[24000]])
    assert 8000 in mt.windows and 24000 in mt.windows
    mt.remove_track(0)
    assert 8000 not in mt.windows  # sr cache dropped (lib.rs:287-290)
    assert mt.max_sr == 24000
    assert 0 not in mt.tracks
    with pytest.raises(TrackNotFoundError):
        mt.get_sr(0)
    with pytest.raises(TrackNotFoundError):
        mt.remove_track(0)


def test_db_hysteresis(wav_dir):
    """Re-adding an identical track must not flip `changed` (1e-3 epsilon,
    lib.rs:211-218)."""
    mt = MultiTrack()
    assert mt.add_tracks([0], [wav_dir[16000]])
    assert not mt.add_tracks([1], [wav_dir[16000]])  # same content, same range


def test_linear_scale_session(wav_dir):
    mt = MultiTrack(SpecSetting(freq_scale=FreqScale.LINEAR))
    mt.add_tracks([0, 1], [wav_dir[8000], wav_dir[16000]])
    g8 = mt.get_grey(0)
    st = mt._state[0]
    # linear up_ratio = 16000/8000 = 2 -> height doubles
    assert g8.shape[0] == 2 * st.n_out
    img = mt.get_spec_image(0, 50.0, 100)
    assert img.shape == (100, 25, 3)


def test_frequency_readout(wav_dir):
    mt = MultiTrack(SpecSetting(freq_scale=FreqScale.LINEAR))
    mt.add_tracks([0], [wav_dir[16000]])
    assert mt.get_frequency_hz(0, 0.5) == pytest.approx(4000.0)
    mt2 = MultiTrack()  # mel
    mt2.add_tracks([0], [wav_dir[16000]])
    # relative 1.0 -> nyquist either way (lib.rs:315-322)
    assert mt2.get_frequency_hz(0, 1.0) == pytest.approx(8000.0, rel=1e-4)
    mid = mt2.get_frequency_hz(0, 0.5)
    assert 0 < mid < 4000.0  # mel is denser at low frequencies


def test_session_checkpoint_roundtrip(wav_dir, tmp_path):
    mt = MultiTrack()
    mt.add_tracks([0, 1], [wav_dir[8000], wav_dir[24000]])
    p = str(tmp_path / "session.json")
    mt.save_session(p)
    mt2 = MultiTrack.load_session(p)
    assert set(mt2.tracks) == {0, 1}
    assert mt2.get_max_db() == pytest.approx(mt.get_max_db(), abs=1e-4)
    assert mt2.get_min_db() == pytest.approx(mt.get_min_db(), abs=1e-4)
    img1 = mt.get_spec_image(1, 60.0, 100)
    img2 = mt2.get_spec_image(1, 60.0, 100)
    np.testing.assert_array_equal(img1, img2)


def test_newline_joined_paths_ffi_parity(wav_dir):
    # lib.rs:171-173: wasm-bindgen passes one newline-joined string
    mt = MultiTrack()
    mt.add_tracks([0, 1], wav_dir[8000] + "\n" + wav_dir[16000])
    assert set(mt.tracks) == {0, 1}


def test_pallas_engine_matches_xla(wav_dir):
    """Session with the fused Pallas engine (interpret on CPU) must produce
    the same images as the XLA engine."""
    from msv_tpu.config import set_engine

    mt_x = MultiTrack()
    mt_x.add_tracks([0], [wav_dir[16000]])
    img_x = mt_x.get_spec_image(0, 80.0, 160, wire="rgb")
    set_engine("pallas")
    try:
        mt_p = MultiTrack()
        mt_p.add_tracks([0], [wav_dir[16000]])
        img_p = mt_p.get_spec_image(0, 80.0, 160, wire="rgb")
    finally:
        set_engine("auto")
    # k-tile accumulation order differs -> ~0.005 dB scalar wiggle, far
    # below one grey quantization step (120 dB / 255 = 0.47 dB)
    assert abs(mt_p.get_max_db() - mt_x.get_max_db()) < 0.02
    assert abs(mt_p.get_min_db() - mt_x.get_min_db()) < 0.02
    diff = np.abs(img_p.astype(int) - img_x.astype(int))
    assert diff.max() <= 1  # identical up to u8 rounding at lerp boundaries


def test_set_setting_reload(wav_dir):
    """Settings change reloads all tracks with re-derived params
    (AudioTrack::reload semantics, lib.rs:57-61)."""
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    assert mt.tracks[0].win_length == 640  # 40 ms @ 16 kHz
    n_out_mel = mt._state[0].n_out
    mt.set_setting(SpecSetting(win_ms=20.0, freq_scale=FreqScale.LINEAR))
    assert mt.tracks[0].win_length == 320  # 20 ms @ 16 kHz
    assert mt.tracks[0].n_fft == 512
    assert mt._state[0].n_out == 257  # linear: n_freq, not mel bands
    assert mt._state[0].n_out != n_out_mel
    img = mt.get_spec_image(0, 60.0, 120)
    assert img.shape == (120, 30, 3)


def test_streaming_threshold_path_matches(wav_dir, monkeypatch):
    """Long tracks route through the segmented streaming engine and must be
    pixel-identical to the one-shot pipeline."""
    from msv_tpu.session import multitrack as mtmod

    mt_ref = MultiTrack()
    mt_ref.add_tracks([0], [wav_dir[16000]])
    img_ref = mt_ref.get_spec_image(0, 80.0, 150)

    monkeypatch.setattr(mtmod, "STREAMING_FRAME_THRESHOLD", 4)
    mt_s = MultiTrack()
    mt_s.add_tracks([0], [wav_dir[16000]])
    assert mt_s._state[0].n_frames == mt_ref._state[0].n_frames
    img_s = mt_s.get_spec_image(0, 80.0, 150)
    assert abs(mt_s.get_max_db() - mt_ref.get_max_db()) < 1e-3
    diff = np.abs(img_s.astype(int) - img_ref.astype(int))
    assert diff.max() <= 1


def test_spec_image_crop_matches_full(wav_dir):
    """Viewport crop render == slicing the full-width image."""
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    full = mt.get_spec_image(0, 200.0, 160)  # 100 px wide (0.5 s)
    crop = mt.get_spec_image_crop(0, 200.0, 160, 0.1, 0.35)
    c0, c1 = int(200 * 0.1), int(200 * 0.35)
    assert crop.shape == (160, c1 - c0, 3)
    np.testing.assert_array_equal(crop, full[:, c0:c1])
    # degenerate windows
    assert mt.get_spec_image_crop(0, 200.0, 160, 0.4, 0.4).shape == (160, 0, 3)
    assert mt.get_spec_image_crop(0, 200.0, 160, 10.0, 20.0).shape[1] == 0


def test_fast_precision_mode_session(wav_dir):
    """bf16 fast mode must stay within one grey quantization step."""
    from msv_tpu.config import set_precision_mode

    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[24000]])
    img_p = mt.get_spec_image(0, 60.0, 120)
    set_precision_mode("fast")
    try:
        mt_f = MultiTrack()
        mt_f.add_tracks([0], [wav_dir[24000]])
        img_f = mt_f.get_spec_image(0, 60.0, 120)
    finally:
        set_precision_mode("parity")
    diff = np.abs(img_p.astype(int) - img_f.astype(int))
    # CPU-scoped bound (DEFAULT ~= HIGHEST off-MXU).  On real TPU, fast mode
    # keeps ~90% of pixels exact but deep-null pixels can swing (measured
    # maxdiff 131 at 0.09% of pixels... see README Modes); parity mode is
    # the pixel contract.
    assert diff.max() <= 3
    assert (diff > 1).mean() < 0.01


def test_session_state_machine_sequences(wav_dir):
    """Add/remove/re-add churn keeps every invariant (fuzzes the state
    machine the reference implements in lib.rs:170-292)."""
    mt = MultiTrack()
    mt.add_tracks([0, 1], [wav_dir[8000], wav_dir[24000]])
    mt.remove_track(1)
    assert mt.max_sr == 8000
    assert 24000 not in mt.windows
    mt.add_tracks([2], [wav_dir[16000]])
    assert mt.max_sr == 16000
    assert sorted(mt.tracks) == [0, 2]
    # re-add id 1 with a different file
    mt.add_tracks([1], [wav_dir[24000]])
    assert mt.max_sr == 24000
    # every track still renders with the shared alignment
    for tid in sorted(mt.tracks):
        img = mt.get_spec_image(tid, 40.0, 90)
        assert img.shape[0] == 90 and img.shape[1] > 0
    # empty the session
    for tid in [0, 1, 2]:
        mt.remove_track(tid)
    assert mt.max_sr == 0 and mt.get_max_sec() == 0.0


def test_batched_add_matches_sequential(wav_dir, rng, tmp_path):
    """Same-bucket tracks computed in one vmapped launch must equal the
    per-track path bit-for-bit."""
    # three distinct files at the same rate -> one batch group
    paths = []
    for k in range(3):
        x = (rng.standard_normal(8000) * 0.3).astype(np.float32)
        p = str(tmp_path / f"b{k}.wav")
        write_wav(p, x[None], 16000)
        paths.append(p)
    mt_b = MultiTrack()
    mt_b.add_tracks([0, 1, 2], paths)  # batched (one group of 3)
    mt_s = MultiTrack()
    for i, p in enumerate(paths):
        mt_s.add_tracks([i], [p])  # sequential singles
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(mt_b._state[i].spec_db), np.asarray(mt_s._state[i].spec_db)
        )
        assert mt_b._state[i].smin == mt_s._state[i].smin
        assert mt_b._state[i].smax == mt_s._state[i].smax
    img_b = mt_b.get_spec_image(1, 60.0, 100)
    img_s = mt_s.get_spec_image(1, 60.0, 100)
    np.testing.assert_array_equal(img_b, img_s)


def test_wav_image_crop_matches_full(wav_dir):
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    full = mt.get_wav_image(0, 200.0, 80, -1.0, 1.0)  # 100 px wide
    crop = mt.get_wav_image_crop(0, 200.0, 80, -1.0, 1.0, 0.1, 0.35)
    c0, c1 = int(200 * 0.1), int(200 * 0.35)
    assert crop.shape == (80, c1 - c0, 4)
    np.testing.assert_array_equal(crop, full[:, c0:c1])
    assert mt.get_wav_image_crop(0, 200.0, 80, -1.0, 1.0, 0.4, 0.4).shape[1] == 0


def test_session_random_operation_fuzz(wav_dir, rng):
    """Random add/remove/render/zoom/setting sequences keep all invariants
    (max_db<=0, min_db window, alignment heights, no exceptions)."""
    paths = list(wav_dir.values())
    mt = MultiTrack()
    next_id = 0
    live = []
    for step in range(40):
        op = rng.integers(0, 5)
        if op == 0 or not live:  # add
            mt.add_tracks([next_id], [paths[int(rng.integers(0, len(paths)))]])
            live.append(next_id)
            next_id += 1
        elif op == 1 and len(live) > 1:  # remove
            tid = live.pop(int(rng.integers(0, len(live))))
            mt.remove_track(tid)
        elif op == 2:  # spec render at random zoom
            tid = live[int(rng.integers(0, len(live)))]
            img = mt.get_spec_image(tid, float(rng.integers(10, 200)), 64)
            assert img.shape[0] == 64 and img.dtype == np.uint8
        elif op == 3:  # wav render
            tid = live[int(rng.integers(0, len(live)))]
            img = mt.get_wav_image(tid, float(rng.integers(10, 200)), 40, -1.0, 1.0)
            assert img.shape[0] == 40
        else:  # frequency readout
            tid = live[int(rng.integers(0, len(live)))]
            hz = mt.get_frequency_hz(tid, float(rng.random()))
            assert 0.0 <= hz <= mt.get_sr(tid) / 2 + 1
        # invariants after every op
        if mt.tracks:
            assert mt.get_max_db() <= 0.0
            assert mt.get_min_db() >= mt.get_max_db() - 120.0 - 1e-3
            assert mt.max_sr == max(t.sr for t in mt.tracks.values())


def test_streamed_float_track_deep_zoom_envelope(tmp_path, monkeypatch):
    """A streamed TRUE-FLOAT track (no integer carrier) must still render
    deep-zoom waveform envelopes: the adopted device buffer's host-f32
    view comes from the track's mono, not a (None) integer source."""
    from msv_tpu.io.audio import write_wav
    from msv_tpu.session import multitrack as mtmod

    rng = np.random.default_rng(5)
    sr = 8000
    x = (rng.standard_normal(sr) * 0.3).astype(np.float32)  # full entropy
    path = str(tmp_path / "float.wav")
    write_wav(path, x[None, :], sr, bits=32)

    monkeypatch.setattr(mtmod, "STREAMING_FRAME_THRESHOLD", 4)
    mt = MultiTrack()
    mt.add_tracks([0], [path])
    assert mt.tracks[0]._wav_int is None  # premise: true-float source
    # deep zoom: more px than samples -> the upsample branch reads wav_np
    img = mt.get_wav_image(0, 2 * sr, 60, -1.0, 1.0)
    assert img.shape == (60, 2 * sr, 4)
    assert img[:, :, 3].any()


def test_replacing_track_id_refreshes_envelope(tmp_path):
    """Re-adding an id with a different file must not keep serving the old
    file's cached device waveform in get_wav_image."""
    from msv_tpu.io.audio import write_wav

    sr = 8000
    t = np.arange(sr) / sr
    loud = (0.9 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    quiet = (0.05 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p1 = str(tmp_path / "loud.wav")
    p2 = str(tmp_path / "quiet.wav")
    write_wav(p1, loud[None, :], sr)
    write_wav(p2, quiet[None, :], sr)

    mt = MultiTrack()
    mt.add_tracks([0], [p1])
    img_loud = mt.get_wav_image(0, 50.0, 120, -1.0, 1.0)
    mt.add_tracks([0], [p2])  # replace same id
    img_quiet = mt.get_wav_image(0, 50.0, 120, -1.0, 1.0)
    # quiet file -> envelope hugs the centerline; loud fills the height
    assert (img_quiet[:, :, 3] > 0).sum() < (img_loud[:, :, 3] > 0).sum()


def test_session_stateful_fuzz(tmp_path, rng):
    """Randomized add/replace/remove/set_setting sequences: after every
    op the session's global dB window, duration, and renders must equal a
    session built from scratch with the same tracks — the reference's
    incremental state machine (update_spec_greys lib.rs:193-263, remove
    bookkeeping lib.rs:265-292) may never drift from recompute-from-zero."""
    from msv_tpu.config import SpecSetting

    sr_pool = [8000, 16000]
    paths = []
    for i in range(4):
        sr = sr_pool[i % 2]
        t = np.arange(int(sr * (0.4 + 0.2 * i))) / sr
        amp = 0.1 + 0.25 * i
        x = (amp * np.sin(2 * np.pi * (150 + 80 * i) * t)).astype(np.float32)
        p = str(tmp_path / f"t{i}.wav")
        write_wav(p, x[None], sr)
        paths.append(p)
    import os as _os

    flac = _os.path.join(_os.path.dirname(__file__), "fixtures",
                         "sine440_8k.flac")
    if _os.path.exists(flac):
        paths.append(flac)

    mt = MultiTrack()
    live = {}  # id -> path
    setting = SpecSetting()
    for step in range(12):
        op = rng.choice(["add", "remove", "setting"], p=[0.55, 0.3, 0.15])
        if op == "add":
            id = int(rng.integers(0, 5))
            p = paths[int(rng.integers(0, len(paths)))]
            mt.add_tracks([id], [p])
            live[id] = p
        elif op == "remove" and live:
            id = rng.choice(sorted(live))
            mt.remove_track(int(id))
            live.pop(id)
        elif op == "setting":
            from msv_tpu import FreqScale as _FS

            setting = SpecSetting(
                win_ms=float(rng.choice([20.0, 40.0])),
                t_overlap=int(rng.choice([2, 4])),
                freq_scale=_FS.MEL if rng.random() < 0.5 else _FS.LINEAR,
                db_range=float(rng.choice([60.0, 120.0])),
            )
            mt.set_setting(setting)

        # oracle: a fresh session with the same tracks and setting
        oracle = MultiTrack(setting=setting)
        if live:
            ids = sorted(live)
            oracle.add_tracks(ids, [live[i] for i in ids])
        assert mt.get_max_db() == pytest.approx(oracle.get_max_db(), abs=1e-4), step
        assert mt.get_min_db() == pytest.approx(oracle.get_min_db(), abs=1e-4), step
        assert mt.get_max_sec() == pytest.approx(oracle.get_max_sec()), step
        for id in sorted(live):
            a = mt.get_spec_image(id, 50.0, 60)
            b = oracle.get_spec_image(id, 50.0, 60)
            np.testing.assert_array_equal(a, b, err_msg=f"step {step} id {id}")
            aw = mt.get_wav_image(id, 50.0, 40, -1.0, 1.0)
            bw = oracle.get_wav_image(id, 50.0, 40, -1.0, 1.0)
            np.testing.assert_array_equal(aw, bw, err_msg=f"step {step} id {id}")


def test_get_spec_db_export(wav_dir):
    """Public raw-dB accessor: matches the array behind the renders and
    the documented shape contract."""
    from msv_tpu.utils.errors import TrackNotFoundError

    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    db = mt.get_spec_db(0)
    assert db.dtype == np.float32 and db.ndim == 2
    assert db.shape[0] == mt._state[0].n_frames
    assert np.isfinite(db).all()
    assert db.max() <= 0.0 + 200  # dB values, sane magnitude
    with pytest.raises(TrackNotFoundError):
        mt.get_spec_db(99)


def test_image_wire_formats(wav_dir):
    """Grey-wire downlink (docs/PARITY.md deviation 4): the default grey8
    path must equal the reference colormap evaluated at the quantized
    grey (LUT reconstruction is exact), stay within the documented bound
    of the exact rgb path, and keep crop==full-slice parity."""
    import jax.numpy as jnp

    from msv_tpu.config import get_image_wire
    from msv_tpu.render.colormap import _host_lut, grey_to_rgb_array

    assert get_image_wire() == "grey8"  # the documented default

    # the host LUT IS the device colormap at the quantized grid points
    for bits in (8, 16):
        levels = 1 << bits
        qs = np.arange(levels, dtype=np.uint32)
        if bits == 16:
            qs = qs[:: 37]  # sparse sweep keeps the check fast
        grey = (qs.astype(np.float32) / np.float32(levels - 1)).astype(np.float32)
        dev = np.asarray(grey_to_rgb_array(jnp.asarray(grey)))
        np.testing.assert_array_equal(_host_lut(bits)[qs], dev)

    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    exact = mt.get_spec_image(0, 100.0, 200, wire="rgb").astype(np.int32)
    g8 = mt.get_spec_image(0, 100.0, 200, wire="grey8").astype(np.int32)
    g16 = mt.get_spec_image(0, 100.0, 200, wire="grey16").astype(np.int32)
    assert np.abs(g8 - exact).max() <= 3  # measured bound (PARITY.md)
    assert np.abs(g16 - exact).max() <= 1
    # default == grey8
    np.testing.assert_array_equal(
        mt.get_spec_image(0, 100.0, 200), g8.astype(np.uint8)
    )
    # crop parity holds per wire format
    for wire in ("rgb", "grey8", "grey16"):
        full = mt.get_spec_image(0, 200.0, 160, wire=wire)
        crop = mt.get_spec_image_crop(0, 200.0, 160, 0.1, 0.35, wire=wire)
        c0, c1 = int(200 * 0.1), int(200 * 0.35)
        np.testing.assert_array_equal(crop, full[:, c0:c1], err_msg=wire)
    with pytest.raises(ValueError):
        mt.get_spec_image(0, 100.0, 200, wire="grey4")


def test_render_size_caps(wav_dir):
    """Full-width renders past MAX_RENDER_COLS/ROWS raise instead of
    allocating (docs/PARITY.md deviation 2); the crop APIs keep working
    at the same zoom level because they are O(viewport)."""
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])  # 0.5 s track
    with pytest.raises(ValueError):
        mt.get_spec_image(0, 1e7, 100)  # 5M derived columns
    with pytest.raises(ValueError):
        mt.get_wav_image(0, 1e7, 80, -1.0, 1.0)
    with pytest.raises(ValueError):
        mt.get_spec_image(0, 100.0, 1 << 17)
    with pytest.raises(ValueError):
        mt.get_wav_image_crop(0, 1e8, 80, -1.0, 1.0, 0.0, 0.5)  # huge viewport
    # joint area cap: each axis individually under its per-axis cap, but
    # 2^21 x 2^15 = 2^36 px (~256 GB RGBA) must raise (VERDICT r3 weak #3)
    from msv_tpu.session.multitrack import (MAX_RENDER_AREA,
                                            MAX_RENDER_COLS,
                                            MAX_RENDER_ROWS,
                                            _check_render_dims)
    assert (1 << 21) <= MAX_RENDER_COLS and (1 << 15) <= MAX_RENDER_ROWS
    with pytest.raises(ValueError, match="MAX_RENDER_AREA"):
        _check_render_dims(1 << 21, 1 << 15, "test")
    # an hour at the default viewer zoom (100 px/s x 500 rows) still passes
    _check_render_dims(360_000, 500, "test")
    assert 360_000 * 500 <= MAX_RENDER_AREA
    # wired through the public APIs: derived 2^21 cols x 2^15 rows raises
    with pytest.raises(ValueError, match="MAX_RENDER_AREA"):
        mt.get_spec_image(0, (1 << 21) / 0.5, 1 << 15)
    with pytest.raises(ValueError, match="MAX_RENDER_AREA"):
        mt.get_wav_image(0, (1 << 21) / 0.5, 1 << 15, -1.0, 1.0)
    # same px_per_sec through the viewport APIs: fine
    img = mt.get_spec_image_crop(0, 1e7, 100, 0.2, 0.2001)
    assert img.shape[0] == 100 and 900 <= img.shape[1] <= 1100
    wimg = mt.get_wav_image_crop(0, 1e7, 80, -1.0, 1.0, 0.2, 0.2001)
    assert wimg.shape[0] == 80 and 900 <= wimg.shape[1] <= 1100


def test_get_spec_db_wire_formats(wav_dir):
    """Opt-in packed dB export must stay within its documented
    quantization bound of the default bit-exact f32 fetch."""
    from msv_tpu.config import get_db_wire

    assert get_db_wire() == "f32"
    mt = MultiTrack()
    mt.add_tracks([0], [wav_dir[16000]])
    exact = mt.get_spec_db(0, wire="f32")
    st = mt._state[0]
    rng_db = st.smax - st.smin
    for wire, bits in [("q16", 16), ("q12", 12), ("q10", 10), ("q8", 8)]:
        got = mt.get_spec_db(0, wire=wire)
        assert got.shape == exact.shape and got.dtype == np.float32
        bound = 0.5 * rng_db / ((1 << bits) - 1) + 1e-4
        assert np.abs(got - exact).max() <= bound, wire
    # the public export default is the bit-exact fetch (lossy is opt-in)
    np.testing.assert_array_equal(mt.get_spec_db(0), exact)
    with pytest.raises(ValueError):
        mt.get_spec_db(0, wire="q7")


def test_pallas_grouped_add_matches_individual(wav_dir, tmp_path, rng):
    """Under the pallas engine, same-bucket tracks added together batch
    into one kernel launch — per-track dB state and renders must be
    bit-identical to adding each track alone (the batched kernel rows
    are bit-equal to single launches), and mixed-bucket groups still
    work (different sr falls into separate launches)."""
    from msv_tpu.config import set_engine

    # second 16 kHz file: same bucket as wav_dir[16000]
    sr = 16000
    t = np.arange(int(sr * 0.5)) / sr
    x = 0.4 * np.sin(2 * np.pi * 700 * t) + 0.05 * rng.standard_normal(len(t))
    p2 = str(tmp_path / "tone2_16k.wav")
    write_wav(p2, x.astype(np.float32)[None, :], sr)

    set_engine("pallas")
    try:
        mt_solo = MultiTrack()
        mt_solo.add_tracks([0], [wav_dir[16000]])
        mt_solo.add_tracks([1], [p2])
        mt_solo.add_tracks([2], [wav_dir[8000]])

        mt_grp = MultiTrack()
        mt_grp.add_tracks([0, 1, 2], [wav_dir[16000], p2, wav_dir[8000]])

        for tid in (0, 1, 2):
            ss, sg = mt_solo._state[tid], mt_grp._state[tid]
            assert (ss.smin, ss.smax) == (sg.smin, sg.smax), tid
            np.testing.assert_array_equal(
                np.asarray(ss.spec_db), np.asarray(sg.spec_db),
                err_msg=f"track {tid}",
            )
        for tid in (0, 1, 2):
            np.testing.assert_array_equal(
                mt_grp.get_spec_image(tid, 60.0, 120),
                mt_solo.get_spec_image(tid, 60.0, 120),
                err_msg=f"track {tid}",
            )
    finally:
        set_engine("auto")


def test_pallas_pcm16_ships_int16_carrier(wav_dir, tmp_path, rng):
    """PCM16 tracks under the pallas engine upload their int16 carrier
    (the kernel scales by 2^-15 in assembly — half the host->device
    bytes); true-float tracks ship f32 and land in a SEPARATE batch
    group (the stack's wire dtype is uniform).  Both bit-equal to the
    XLA-engine state."""
    import msv_tpu.session.multitrack as mtmod
    from msv_tpu.config import set_engine
    from msv_tpu.io.audio import write_wav
    from msv_tpu.kernels import spectrogram_pallas as sp

    sr = 16000
    t = np.arange(int(sr * 0.5)) / sr
    x2 = (0.4 * np.sin(2 * np.pi * 700 * t)
          + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    p2 = str(tmp_path / "tone2_16k.wav")  # PCM16: same bucket as wav_dir
    write_wav(p2, x2[None], sr)
    pf = str(tmp_path / "tonef_16k.wav")  # IEEE float: f32 carrier
    write_wav(pf, (x2 * 0.77)[None], sr, bits=32)

    seen = []
    orig = sp.mel_spectrogram_pallas

    def spy(wav2d, *a, **k):
        seen.append((str(wav2d.dtype), wav2d.ndim))
        return orig(wav2d, *a, **k)

    set_engine("pallas")
    try:
        # the session imports the kernel inside each method, so patching
        # the kernels module intercepts every launch
        sp.mel_spectrogram_pallas = spy
        try:
            mt = MultiTrack()
            mt.add_tracks([0, 1, 2],
                          [wav_dir[16000], p2, pf])
        finally:
            sp.mel_spectrogram_pallas = orig
        # one int16 batched launch (the two PCM16 tracks) + one f32 solo
        assert ("int16", 3) in seen, seen
        assert all(d == "int16" for d, n in seen if n == 3), seen
        assert ("float32", 2) in seen, seen
    finally:
        set_engine("auto")

    mt_x = MultiTrack()
    mt_x.add_tracks([0, 1, 2], [wav_dir[16000], p2, pf])
    for tid in (0, 1, 2):
        sp_, sx = mt._state[tid], mt_x._state[tid]
        # pallas k-tile accumulation differs from the XLA dot order by
        # ~0.005 dB; the int16 wire itself is exact (scale commutes)
        assert abs(sp_.smin - sx.smin) < 0.02 and abs(sp_.smax - sx.smax) < 0.02


def test_replace_longest_track_with_shorter_lowers_max_sec(tmp_path, rng):
    """Re-adding the id that holds id_max_sec with a SHORTER file must
    lower max_sec (a raise-only update left it stale — found by
    fresh-seed stateful fuzz, seed 7005 step 4)."""
    from msv_tpu.io.audio import write_wav

    sr = 8000
    pl = str(tmp_path / "long.wav")
    ps = str(tmp_path / "short.wav")
    write_wav(pl, (0.3 * rng.standard_normal(sr)).astype(np.float32)[None], sr)
    write_wav(ps, (0.3 * rng.standard_normal(int(sr * 0.6))
                   ).astype(np.float32)[None], sr)
    mt = MultiTrack()
    mt.add_tracks([0, 1], [ps, pl])
    assert mt.get_max_sec() == pytest.approx(1.0, abs=1e-3)
    assert mt.id_max_sec == 1
    mt.add_tracks([1], [ps])  # replace the longest with the short file
    assert mt.get_max_sec() == pytest.approx(0.6, abs=1e-3)
    # and duration getters agree with a fresh session
    oracle = MultiTrack()
    oracle.add_tracks([0, 1], [ps, ps])
    assert mt.get_max_sec() == oracle.get_max_sec()


def test_add_tracks_length_mismatch_is_loud(tmp_path, rng):
    """Mismatched id/path/channels lists must raise, not zip-truncate
    (regression: add_tracks([0, 1], [a, b], channels=[0]) silently
    added only track 0)."""
    import numpy as np

    from msv_tpu import MultiTrack
    from msv_tpu.io.audio import write_wav

    p = str(tmp_path / "t.wav")
    write_wav(p, (0.2 * rng.standard_normal(4000)).astype(
        np.float32)[None], 8000)
    mt = MultiTrack()
    with pytest.raises(ValueError, match="drop"):
        mt.add_tracks([0, 1], [p, p], channels=[0])
    with pytest.raises(ValueError, match="drop"):
        mt.add_tracks([0, 1], [p])
    assert mt.tracks == {}  # nothing partially added
