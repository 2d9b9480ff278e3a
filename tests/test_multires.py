"""Adaptive multi-resolution spectrogram tests (ops/multires.py — the
reference's unimplemented roadmap item, ReadMe.md:18)."""

import numpy as np
import pytest

from msv_tpu.config import SpecSetting
from msv_tpu.ops.multires import multires_mel_spec_db, _scale_params


def test_scale_params_share_hop():
    hop, wins = _scale_params(16000, SpecSetting(), (1, 2, 4))
    assert hop == 160
    assert [w for w, _ in wins] == [640, 320, 160]
    assert all(w % 2 == 0 for w, _ in wins)


def test_single_scale_is_plain_spectrogram(rng):
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    db1, n1 = multires_mel_spec_db(wav, 16000, scales=(1,), n_mel=64)
    db3, n3 = multires_mel_spec_db(wav, 16000, scales=(1, 1, 1), n_mel=64)
    assert n1 == n3
    # blending identical scales is the identity (convex combination)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db3), atol=1e-4)


def test_blend_is_convex_combination(rng):
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    db, n = multires_mel_spec_db(wav, 16000, scales=(1, 4), n_mel=64)
    db_long, _ = multires_mel_spec_db(wav, 16000, scales=(1,), n_mel=64)
    db_short, _ = multires_mel_spec_db(wav, 16000, scales=(4,), n_mel=64)
    lo = np.minimum(np.asarray(db_long), np.asarray(db_short))[:n]
    hi = np.maximum(np.asarray(db_long), np.asarray(db_short))[:n]
    got = np.asarray(db)[:n]
    assert (got >= lo - 1e-3).all() and (got <= hi + 1e-3).all()


def test_transient_sharper_than_long_window():
    """A click smears over ~win frames at coarse resolution; the adaptive
    blend should localize it better than the long window alone."""
    sr = 16000
    wav = np.zeros(sr // 2, np.float32)
    wav[4000] = 1.0
    db_a, n = multires_mel_spec_db(wav, sr, scales=(1, 4), n_mel=64)
    db_l, _ = multires_mel_spec_db(wav, sr, scales=(1,), n_mel=64)

    def spread(db):
        e = np.asarray(db)[:n].mean(axis=1)
        e = e - e.min()
        # frames above half-max around the click
        return (e > 0.5 * e.max()).sum()

    assert spread(db_a) <= spread(db_l)


def test_shapes_and_finiteness(rng):
    wav = (rng.standard_normal(12345) * 0.3).astype(np.float32)
    db, n = multires_mel_spec_db(wav, 8000, scales=(1, 2, 4), n_mel=96)
    assert db.shape == (n, 96)
    assert np.isfinite(np.asarray(db)).all()


def test_range_equals_full_slice(rng):
    """multires_mel_spec_db_range computed from the minimal sample slice
    must equal slicing the full computation — including both track edges
    (reflect + zero-extension alignment) and single-frame ranges."""
    from msv_tpu.config import SpecSetting
    from msv_tpu.ops.multires import (
        adaptive_frame_count,
        multires_mel_spec_db_range,
        range_sample_window,
    )

    st = SpecSetting()
    for sr, n in [(8000, 24000), (16000, 20800), (22050, 15437)]:
        wav = (rng.standard_normal(n) * 0.3).astype(np.float32)
        full, nf = multires_mel_spec_db(wav, sr, st, n_mel=64)
        full = np.asarray(full)
        assert adaptive_frame_count(n, sr, st) == nf
        ranges = [(0, nf), (0, 5), (nf - 5, nf), (nf // 3, nf // 3 + 40),
                  (1, 2), (nf - 1, nf), (0, 1)]
        ranges += [tuple(sorted(rng.integers(0, nf, 2))) for _ in range(4)]
        for f0, f1 in ranges:
            if f1 == f0:
                f1 = f0 + 1
            s0, s1 = range_sample_window(n, sr, st, f0, f1)
            db, _ = multires_mel_spec_db_range(
                wav[s0:s1], sr, f0, f1, setting=st, slice_start=s0,
                n_samples=n, n_mel=64,
            )
            np.testing.assert_array_equal(
                np.asarray(db), full[f0:f1], err_msg=f"{sr} {f0}:{f1}"
            )


def test_auto_n_mel_no_empty_bands():
    """The shared-basis auto band count must leave no empty mel row at
    the SMALLEST scale (empty rows rendered as black banding with the
    old fixed-128 default)."""
    from msv_tpu.config import SpecSetting
    from msv_tpu.ops.mel import calc_mel_fb
    from msv_tpu.ops.multires import _scale_params, adaptive_auto_n_mel

    for sr in (8000, 16000, 22050, 44100):
        st = SpecSetting()
        n_mel = adaptive_auto_n_mel(sr, st)
        _, wins = _scale_params(sr, st, (1, 2, 4))
        for _, n_fft in wins:
            fb = calc_mel_fb(sr, n_fft, n_mel, 0.0, None, True, np.float32)
            assert (fb.sum(axis=0) > 0).all(), (sr, n_fft, n_mel)


def test_session_adaptive_crop_stitches(reference_sample_paths):
    """Session adaptive viewport renders: adjacent crops stitch
    pixel-exactly into the full-range crop, and the degenerate/oversize
    guards hold."""
    from msv_tpu import MultiTrack

    mt = MultiTrack()
    mt.add_tracks([0], [reference_sample_paths[0]])
    sec = mt.tracks[0].sec
    full = mt.get_adaptive_spec_image_crop(0, 50, 200, 0.0, sec + 1.0)
    a = mt.get_adaptive_spec_image_crop(0, 50, 200, 0.0, 7.0)
    b = mt.get_adaptive_spec_image_crop(0, 50, 200, 7.0, sec + 1.0)
    stitch = np.concatenate([a, b], axis=1)
    assert stitch.shape == full.shape
    np.testing.assert_array_equal(stitch, full)
    # degenerate window -> empty image, not an error
    assert mt.get_adaptive_spec_image_crop(0, 50, 200, 5.0, 5.0).shape == \
        (200, 0, 3)
    # past the slice-local support budget the render switches to the
    # per-track cached full dB (segmented build) — pixel-identical to the
    # slice-local path, and cached for re-renders
    old = MultiTrack.ADAPTIVE_MAX_FRAMES
    MultiTrack.ADAPTIVE_MAX_FRAMES = 64
    try:
        via_cache = mt.get_adaptive_spec_image_crop(0, 50, 200, 0.0,
                                                    sec + 1.0)
        assert 0 in mt._adaptive_db
        np.testing.assert_array_equal(via_cache, full)
        # second render reuses the cache (same object, no rebuild)
        cached_obj = mt._adaptive_db[0].full
        assert cached_obj is not None
        again = mt.get_adaptive_spec_image_crop(0, 50, 200, 0.0, sec + 1.0)
        assert mt._adaptive_db[0].full is cached_obj
        np.testing.assert_array_equal(again, full)
    finally:
        MultiTrack.ADAPTIVE_MAX_FRAMES = old
    # settings change invalidates the cached adaptive state
    mt.set_setting(mt.setting)
    assert not mt._adaptive_db


def test_range_equals_full_slice_settings_fuzz(rng):
    """The slice-local path must hold under non-default settings: other
    win/hop geometries (odd derived windows, t_overlap extremes,
    f_overlap > 1) stress the reflect/tail alignment differently."""
    from msv_tpu.config import SpecSetting
    from msv_tpu.ops.multires import (
        multires_mel_spec_db_range,
        range_sample_window,
    )

    cases = [
        (8000, SpecSetting(win_ms=25.0, t_overlap=2)),
        (16000, SpecSetting(win_ms=80.0, t_overlap=8, f_overlap=2)),
        (22050, SpecSetting(win_ms=11.0, t_overlap=1)),
        (44100, SpecSetting(win_ms=60.0, t_overlap=3)),
    ]
    for sr, st in cases:
        n = int(rng.integers(sr // 2, sr))
        wav = (rng.standard_normal(n) * 0.3).astype(np.float32)
        full, nf = multires_mel_spec_db(wav, sr, st, n_mel=48)
        full = np.asarray(full)
        ranges = [(0, nf), (nf - 3, nf), (0, 3)]
        ranges += [tuple(sorted(rng.integers(0, nf, 2))) for _ in range(3)]
        for f0, f1 in ranges:
            if f1 == f0:
                f1 = min(nf, f0 + 1)
            s0, s1 = range_sample_window(n, sr, st, f0, f1)
            db, _ = multires_mel_spec_db_range(
                wav[s0:s1], sr, f0, f1, setting=st, slice_start=s0,
                n_samples=n, n_mel=48,
            )
            np.testing.assert_array_equal(
                np.asarray(db), full[f0:f1],
                err_msg=f"sr={sr} win_ms={st.win_ms} {f0}:{f1}",
            )


def test_range_integer_carrier_matches_f32(rng):
    """Passing the int16 carrier + scale (half the host->device wire)
    must produce bit-identical dB to the f32 slice: the device-side
    conversion is exact for power-of-two scales."""
    from msv_tpu.config import SpecSetting
    from msv_tpu.ops.multires import (
        multires_mel_spec_db_range,
        range_sample_window,
    )

    st = SpecSetting()
    sr, n = 8000, 20000
    i16 = (rng.integers(-20000, 20000, n)).astype(np.int16)
    f32 = i16.astype(np.float32) * np.float32(2.0 ** -15)
    for f0, f1 in [(0, 40), (10, 60)]:
        s0, s1 = range_sample_window(n, sr, st, f0, f1)
        a, _ = multires_mel_spec_db_range(
            f32[s0:s1], sr, f0, f1, setting=st, slice_start=s0,
            n_samples=n, n_mel=48,
        )
        b, _ = multires_mel_spec_db_range(
            i16[s0:s1], sr, f0, f1, setting=st, slice_start=s0,
            n_samples=n, n_mel=48, scale=2.0 ** -15,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adaptive_cache_invalidated_on_replace(tmp_path, rng,
                                               reference_sample_paths):
    """Re-adding an id with a different file must drop the cached full
    adaptive dB or zoomed-out renders keep showing the OLD track."""
    from scipy.io import wavfile

    from msv_tpu import MultiTrack

    p = tmp_path / "t.wav"
    wavfile.write(
        str(p), 8000,
        (rng.standard_normal(16000) * 8000).astype(np.int16),
    )
    mt = MultiTrack()
    mt.add_tracks([0], [str(p)])
    old = MultiTrack.ADAPTIVE_MAX_FRAMES
    MultiTrack.ADAPTIVE_MAX_FRAMES = 16
    try:
        a = mt.get_adaptive_spec_image_crop(0, 50, 120, 0.0, 2.1)
        assert 0 in mt._adaptive_db
        mt.add_tracks([0], [reference_sample_paths[0]])  # replace id 0
        assert 0 not in mt._adaptive_db
        b = mt.get_adaptive_spec_image_crop(0, 50, 120, 0.0, 2.1)
        assert not np.array_equal(a, b)  # renders the NEW track
    finally:
        MultiTrack.ADAPTIVE_MAX_FRAMES = old


def test_multires_golden_digest():
    """Regression net over the blend algorithm itself (the A/B tests only
    pin slice-vs-full consistency; this digest catches accidental
    semantic drift).  Regenerate deliberately if the blend is CHANGED on
    purpose: parity-mode CPU, deterministic signal."""
    import hashlib

    sr = 16000
    t = np.arange(sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    wav[::4000] += 0.5
    db, n = multires_mel_spec_db(wav, sr)
    arr = np.ascontiguousarray(np.asarray(db))
    assert arr.shape == (101, 95) and n == 101
    digest = hashlib.sha256(arr.tobytes()).hexdigest()[:16]
    assert digest == "f0108933d94d285f", digest


def test_adaptive_uses_mel_alignment_in_linear_sessions(
        reference_sample_paths):
    """The adaptive view is mel-scaled by construction: in a LINEAR-scale
    session with mixed rates, its headroom band must use the mel ratio
    (the linear max_sr/sr ratio would misplace it)."""
    from msv_tpu import MultiTrack
    from msv_tpu.config import FreqScale, SpecSetting
    from msv_tpu.ops.mel import hz_to_mel
    from msv_tpu.ops.multires import adaptive_auto_n_mel
    from msv_tpu.render.grey import grey_height

    mt = MultiTrack(SpecSetting(freq_scale=FreqScale.LINEAR))
    # 8k + 44.1k tracks: linear ratio 5.51, mel ratio ~1.5
    mt.add_tracks([0, 1], [reference_sample_paths[0],
                           reference_sample_paths[4]])
    img = mt.get_adaptive_spec_image_crop(0, 50, 0, 0.0, 1.0)  # height 0
    assert img.shape[1] == 0 or img.shape[0] == 0  # degenerate ok
    n_mel = adaptive_auto_n_mel(8000, mt.setting)
    f32 = np.float32
    mel_up = float(hz_to_mel(f32(44100) / f32(2)) / hz_to_mel(f32(8000) / f32(2)))
    h = grey_height(n_mel, mel_up)
    # render with nheight == internal grey height: rows above the mel
    # headroom band are colormap(0) = (0, 0, 4), and the band must match
    # the MEL ratio (the linear ratio would give 5.5x, not 1.5x)
    img = mt.get_adaptive_spec_image_crop(0, 20, h, 0.0, 2.0)
    assert img.shape[0] == h
    band_rows = int((img == np.array([0, 0, 4], np.uint8))
                    .all(axis=2).all(axis=1).sum())
    expect_band = h - n_mel
    assert abs(band_rows - expect_band) <= 2, (band_rows, expect_band)


def test_adaptive_background_build_progressive(reference_sample_paths):
    """VERDICT r3 #4: the zoomed-out adaptive full-dB build runs in the
    background.  Non-blocking renders (what the viewer issues) either
    serve from the already-built prefix — pixel-identical to the
    blocking result — or raise AdaptiveBuildPending with progress;
    block=True still waits and matches, and a finished build serves
    everything."""
    import time

    from msv_tpu import MultiTrack
    from msv_tpu.utils.errors import AdaptiveBuildPending

    mt = MultiTrack()
    mt.add_tracks([0], [reference_sample_paths[0]])
    sec = mt.tracks[0].sec
    # blocking ground truth from a fresh session (cache-free)
    mt_ref = MultiTrack()
    mt_ref.add_tracks([0], [reference_sample_paths[0]])

    old_max, old_chunk = (MultiTrack.ADAPTIVE_MAX_FRAMES,
                          MultiTrack.ADAPTIVE_CHUNK)
    # tiny budget + chunk: the sample becomes "hour-scale" relative to
    # the build granularity, so the pending window is observable
    MultiTrack.ADAPTIVE_MAX_FRAMES = 64
    MultiTrack.ADAPTIVE_CHUNK = 256
    try:
        want = mt_ref.get_adaptive_spec_image_crop(0, 50, 160, 0.0,
                                                   sec + 1.0)
        # a far-right viewport cannot be covered by an early prefix:
        # the very first non-blocking call must raise Pending
        with pytest.raises(AdaptiveBuildPending) as exc:
            mt.get_adaptive_spec_image_crop(0, 50, 160, sec - 2.0, sec,
                                            block=False)
        assert 0 <= exc.value.built < exc.value.total
        assert 0 in mt._adaptive_db
        build = mt._adaptive_db[0]
        # progress is surfaced while in flight (or just-finished)
        prog = mt.adaptive_build_progress()
        assert prog == {} or set(prog[0]) == {"built", "total"}
        # a prefix-covered viewport serves WITHOUT waiting for the full
        # build, as soon as enough chunks exist
        deadline = time.time() + 60
        got_left = None
        while time.time() < deadline:
            try:
                got_left = mt.get_adaptive_spec_image_crop(
                    0, 50, 160, 0.0, 1.0, block=False)
                break
            except AdaptiveBuildPending:
                time.sleep(0.02)
        assert got_left is not None
        want_left = mt_ref.get_adaptive_spec_image_crop(0, 50, 160,
                                                        0.0, 1.0)
        np.testing.assert_array_equal(got_left, want_left)
        # block=True waits for completion and matches the ground truth
        got = mt.get_adaptive_spec_image_crop(0, 50, 160, 0.0, sec + 1.0)
        np.testing.assert_array_equal(got, want)
        assert build.done.is_set() and build.full is not None
        # once done, non-blocking serves everything
        got_nb = mt.get_adaptive_spec_image_crop(0, 50, 160, 0.0,
                                                 sec + 1.0, block=False)
        np.testing.assert_array_equal(got_nb, want)
        assert mt.adaptive_build_progress() == {}
    finally:
        MultiTrack.ADAPTIVE_MAX_FRAMES = old_max
        MultiTrack.ADAPTIVE_CHUNK = old_chunk


def test_adaptive_build_releases_segments(reference_sample_paths):
    """Once ``full`` is published the builder drops the per-segment
    arrays — keeping them would retain a second device copy of the whole
    dB plane (~90 MB for an hour track) for the life of the cache."""
    from msv_tpu import MultiTrack

    mt = MultiTrack()
    mt.add_tracks([0], [reference_sample_paths[0]])
    old_max, old_chunk = (MultiTrack.ADAPTIVE_MAX_FRAMES,
                          MultiTrack.ADAPTIVE_CHUNK)
    MultiTrack.ADAPTIVE_MAX_FRAMES = 64
    MultiTrack.ADAPTIVE_CHUNK = 256
    try:
        sec = mt.tracks[0].sec
        mt.get_adaptive_spec_image_crop(0, 50, 120, 0.0, sec + 1.0)
        build = mt._adaptive_db[0]
        assert build.done.is_set() and build.full is not None
        assert build.parts == []
    finally:
        MultiTrack.ADAPTIVE_MAX_FRAMES = old_max
        MultiTrack.ADAPTIVE_CHUNK = old_chunk


def test_adaptive_blocking_cancelled_raises_clear_error(
        reference_sample_paths):
    """A block=True caller whose build was cancelled by a concurrent
    session mutation gets a clear MsvError — NOT AdaptiveBuildPending,
    which would break the blocking contract (nothing is pending)."""
    from msv_tpu import MultiTrack
    from msv_tpu.utils.errors import AdaptiveBuildPending, MsvError

    mt = MultiTrack()
    mt.add_tracks([0], [reference_sample_paths[0]])
    old_max, old_chunk = (MultiTrack.ADAPTIVE_MAX_FRAMES,
                          MultiTrack.ADAPTIVE_CHUNK)
    MultiTrack.ADAPTIVE_MAX_FRAMES = 64
    MultiTrack.ADAPTIVE_CHUNK = 256
    try:
        try:
            mt.get_adaptive_spec_image_crop(0, 50, 120, 0.0, 40.0,
                                            block=False)
        except AdaptiveBuildPending:
            pass
        build = mt._adaptive_db[0]
        mt._drop_adaptive(0)  # concurrent mutation: cancel + evict
        build.thread.join(timeout=60)
        assert not build.thread.is_alive()
        # pin the cancelled-no-publish shape (the builder may have raced
        # past its last cancel check on a fast host) and re-expose it to
        # a blocking caller
        build.full = None
        build.error = None
        mt._adaptive_db[0] = build
        with pytest.raises(MsvError) as exc:
            mt.get_adaptive_spec_image_crop(0, 50, 120, 0.0, 40.0)
        assert not isinstance(exc.value, AdaptiveBuildPending)
        assert "invalidated" in str(exc.value)
    finally:
        MultiTrack.ADAPTIVE_MAX_FRAMES = old_max
        MultiTrack.ADAPTIVE_CHUNK = old_chunk


def test_adaptive_cancel_stops_builder(reference_sample_paths):
    """Invalidating a track mid-build stops the background thread at the
    next segment boundary and never publishes a stale array."""
    import time

    from msv_tpu import MultiTrack
    from msv_tpu.utils.errors import AdaptiveBuildPending

    mt = MultiTrack()
    mt.add_tracks([0], [reference_sample_paths[0]])
    old_max, old_chunk = (MultiTrack.ADAPTIVE_MAX_FRAMES,
                          MultiTrack.ADAPTIVE_CHUNK)
    MultiTrack.ADAPTIVE_MAX_FRAMES = 64
    MultiTrack.ADAPTIVE_CHUNK = 256
    try:
        try:
            mt.get_adaptive_spec_image_crop(0, 50, 120, 0.0, 40.0,
                                            block=False)
        except AdaptiveBuildPending:
            pass
        build = mt._adaptive_db[0]
        mt.remove_track(0)
        assert 0 not in mt._adaptive_db
        assert build.cancel.is_set()
        build.thread.join(timeout=60)
        assert not build.thread.is_alive()
        # a cancelled build never publishes
        assert build.full is None or build.done.is_set()
    finally:
        MultiTrack.ADAPTIVE_MAX_FRAMES = old_max
        MultiTrack.ADAPTIVE_CHUNK = old_chunk
