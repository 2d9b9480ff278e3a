"""Wire codec (parallel/wirepack.py) + segment slicing correctness.

The codec is part of the transfer path for every long-file workload, so
its contract is absolute: unpack(pack(x)) == x bit-exactly for ALL int16
inputs, on both the host oracle and the device implementation, and the
streaming pipeline must produce bitwise-identical output with packing on
or off.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from msv_tpu.parallel.streaming import padded_slice, streaming_spec_db
from msv_tpu.parallel.wirepack import (
    BLOCK,
    pack_i16,
    pack_int,
    unpack_jax,
    unpack_np,
)


def _signals(rng):
    t = np.arange(48000 * 3) / 48000
    return {
        "sine": np.round(0.3 * 32768 * np.sin(2 * np.pi * 220 * t)),
        "sine+noise": np.round(
            32768 * (0.3 * np.sin(2 * np.pi * 220 * t)
                     + 0.02 * rng.standard_normal(len(t)))),
        "quiet_noise": np.round(300 * rng.standard_normal(100000)),
        "constant": np.full(50000, -12345.0),
        "zeros": np.zeros(50000),
        "ramp_wrap": (np.arange(100000) % 65536 - 32768).astype(np.float64),
        "ramp_offset": (np.arange(100000) % 60000 - 17000).astype(np.float64),
        "walk": np.cumsum(rng.integers(-50, 51, 150000)).astype(np.float64),
        "odd_len": rng.integers(-1000, 1000, BLOCK * 3 + 17).astype(np.float64),
        "transient": np.where(np.arange(80000) == 40000, 32767.0, 0.0),
    }


@pytest.mark.parametrize("name", list(_signals(np.random.default_rng(0))))
def test_roundtrip_host(rng, name):
    x = np.clip(_signals(rng)[name], -32768, 32767).astype(np.int16)
    p = pack_i16(x)
    if p is None:
        return  # raw fallback is always correct by construction
    np.testing.assert_array_equal(unpack_np(p), x)
    assert p.nbytes < x.nbytes  # pack() must only choose itself when smaller


@pytest.mark.parametrize("name", ["sine", "sine+noise", "ramp_offset", "walk"])
def test_roundtrip_device_matches_host(rng, name):
    x = np.clip(_signals(rng)[name], -32768, 32767).astype(np.int16)
    p = pack_i16(x)
    assert p is not None
    y_dev = np.asarray(unpack_jax(p))
    np.testing.assert_array_equal(y_dev, x)


def test_incompressible_falls_back_to_raw(rng):
    x = rng.integers(-32768, 32768, 100000).astype(np.int16)
    assert pack_i16(x) is None  # full-scale white noise: packing can't win


def test_tiny_input_not_packed(rng):
    assert pack_i16(rng.integers(-5, 5, 100).astype(np.int16)) is None


def test_all_width_buckets_roundtrip(rng):
    """Exercise every residual bit width 1..18 (incl. >16 from deltas)."""
    for w in range(1, 16):
        amp = 2 ** (w - 1) - 1
        x = rng.integers(-amp - 1, amp + 1, 3 * BLOCK).astype(np.int16)
        p = pack_i16(x)
        if p is not None:
            np.testing.assert_array_equal(unpack_np(p), x)
    # alternating near-extremes: order-1/2 residuals need 17-18 bits, so
    # pack must either fall back or stay exact
    x = np.where(np.arange(3 * BLOCK) % 2 == 0, 30000, -30000).astype(np.int16)
    p = pack_i16(x)
    if p is not None:
        np.testing.assert_array_equal(unpack_np(p), x)


def test_streaming_pack_matches_raw(rng):
    """transfer='pack' and 'raw' must give bitwise-identical pipelines."""
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window

    p = derive_stft_params(8000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(8000, p.n_fft)
    t = np.arange(8000 * 40) / 8000
    wav = np.clip(
        32768 * (0.3 * np.sin(2 * np.pi * 300 * t)
                 + 0.01 * rng.standard_normal(len(t))),
        -32768, 32767,
    ).astype(np.int16)

    kw = dict(chunk_frames=256, seg_chunks=4)
    db_r, nf_r, lo_r, hi_r = streaming_spec_db(
        wav, p.win_length, p.hop_length, c, s, fb, transfer="raw", **kw)
    db_p, nf_p, lo_p, hi_p = streaming_spec_db(
        wav, p.win_length, p.hop_length, c, s, fb, transfer="pack", **kw)
    assert nf_r == nf_p and lo_r == lo_p and hi_r == hi_p
    np.testing.assert_array_equal(np.asarray(db_r), np.asarray(db_p))


def test_padded_slice_matches_reflect_pad(rng):
    """padded_slice is the zero-copy replacement for whole-file
    reflect_pad_center + zero tail; verify exact equality in pieces."""
    from msv_tpu.ops.framing import reflect_pad_center

    for n, win in [(5000, 320), (1600, 320), (12345, 640)]:
        wav = rng.integers(-3000, 3000, n).astype(np.int16)
        half = win // 2
        full = reflect_pad_center(wav, win)
        total = len(full) + 4096  # beyond-end region must read zero
        full_z = np.concatenate([full, np.zeros(4096, np.int16)])
        for a, b in [(0, 100), (0, total), (half - 7, half + 9),
                     (n, total), (total - 50, total),
                     (half + n - 5, half + n + half + 5)]:
            got = padded_slice(wav, a, b, half, n)
            np.testing.assert_array_equal(got, full_z[a:b], err_msg=f"{n},{win},{a},{b}")


def test_padded_slice_float32(rng):
    from msv_tpu.ops.framing import reflect_pad_center

    wav = rng.standard_normal(4000).astype(np.float32)
    half = 160
    full = reflect_pad_center(wav, 320)
    got = padded_slice(wav, 0, len(full), half, 4000, dtype=np.float32)
    np.testing.assert_array_equal(got, full)


def test_native_packer_bitstream_identical_to_numpy(rng):
    """The C packer's contract is the IDENTICAL bitstream (wirepack.cc
    header): order selection, widths, starts, heads, words must all equal
    the numpy oracle's, for i16 and i32 inputs across signal classes."""
    from msv_tpu.parallel.wirepack import _native_lib

    if _native_lib() is None:
        pytest.skip("libmsv_native.so not built")
    t = np.arange(48000 * 2) / 48000
    cases = [
        np.round(9830 * np.sin(2 * np.pi * 220 * t)).astype(np.int16),
        np.clip(
            32768 * (0.3 * np.sin(2 * np.pi * 220 * t)
                     + 0.02 * rng.standard_normal(len(t))),
            -32768, 32767,
        ).astype(np.int16),
        rng.integers(-400, 400, 60000).astype(np.int16),
        (np.arange(60000) % 60000 - 17000).astype(np.int16),
        # int32 channel sums
        np.round(2 * 9830 * np.sin(2 * np.pi * 220 * t)).astype(np.int32),
        rng.integers(-120000, 120000, 60000).astype(np.int32),
    ]
    for i, x in enumerate(cases):
        pn = pack_int(x, native=False)
        pc = pack_int(x, native=True)
        if pn is None or pc is None:
            assert (pn is None) == (pc is None), f"case {i}"
            continue
        assert pc.order == pn.order, f"case {i} order"
        assert pc.out_dtype == pn.out_dtype, f"case {i} dtype"
        np.testing.assert_array_equal(pc.head, pn.head, err_msg=f"case {i}")
        np.testing.assert_array_equal(pc.block_w, pn.block_w,
                                      err_msg=f"case {i}")
        np.testing.assert_array_equal(pc.block_start, pn.block_start,
                                      err_msg=f"case {i}")
        # words may differ only in bucket padding length; compare content
        m = min(len(pc.words), len(pn.words))
        np.testing.assert_array_equal(pc.words[:m], pn.words[:m],
                                      err_msg=f"case {i}")
        assert not pc.words[m:].any() and not pn.words[m:].any()


def test_unpack_jit_family_is_bucketed(rng):
    """Different audio content (different packed sizes) of the SAME length
    must reuse a small set of compiled unpack programs — remote compiles
    cost 40-740 s each, so a content-dependent jit shape would be fatal
    in production (round-2 code-review finding)."""
    from msv_tpu.parallel.wirepack import _bucket_words

    n = 48000 * 4
    t = np.arange(n) / 48000
    shapes = set()
    for amp, noise in [(500, 0.0), (9830, 0.0), (9830, 0.02), (30, 0.001)]:
        x = np.clip(
            amp * np.sin(2 * np.pi * 220 * t)
            + noise * 32768 * rng.standard_normal(n),
            -32768, 32767,
        ).astype(np.int16)
        p = pack_int(x)
        if p is None:
            continue
        nb = _bucket_words(len(p.words), p.n, 2)
        shapes.add((nb, len(p.block_w)))
        y = np.asarray(unpack_jax(p))
        np.testing.assert_array_equal(y, x)
    # 4 wildly different contents -> at most 16 possible buckets by design
    assert len(shapes) <= 4


def test_full_range_int32_roundtrip(rng):
    """Mod-2^32 delta arithmetic: the FULL int32 range round-trips (host
    oracle, device, and native packer all agree)."""
    from msv_tpu.parallel.wirepack import _native_lib

    x = (
        np.cumsum(rng.integers(-(1 << 28), 1 << 28, 40000)) % (1 << 32)
    ).astype(np.uint32).view(np.int32)
    for native in ([False, True] if _native_lib() else [False]):
        p = pack_int(x, native=native)
        assert p is not None, f"native={native}"
        np.testing.assert_array_equal(unpack_np(p), x)
        np.testing.assert_array_equal(np.asarray(unpack_jax(p)), x)


def test_f32_roundtrip_bit_exact(rng):
    """pack_f32: bit-exact on every IEEE pattern class, host and device."""
    from msv_tpu.parallel.wirepack import pack_f32

    t = np.arange(48000 * 2) / 48000
    smooth = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    int16_origin = (
        np.round(np.clip(9830 * np.sin(2 * np.pi * 220 * t), -32768, 32767))
        .astype(np.int16).astype(np.float32) / np.float32(32768.0)
    )
    weird = smooth.copy()
    weird[::97] = np.float32(-0.0)
    weird[1::977] = np.inf
    weird[2::977] = -np.inf
    weird[3::977] = np.nan
    weird[4::977] = np.float32(1e-42)  # denormal
    for name, sig in [("smooth", smooth), ("i16origin", int16_origin),
                      ("weird", weird)]:
        p = pack_f32(sig)
        if p is None:
            continue  # raw fallback is always correct
        y = unpack_np(p)
        np.testing.assert_array_equal(
            y.view(np.uint32), sig.view(np.uint32), err_msg=name
        )
        yd = np.asarray(unpack_jax(p))
        np.testing.assert_array_equal(
            yd.view(np.uint32), sig.view(np.uint32), err_msg=f"{name} dev"
        )
    # the int16-origin case must actually compress (9 stripped planes)
    p = pack_f32(int16_origin)
    assert p is not None and p.nbytes < 0.8 * int16_origin.nbytes


def test_f32_incompressible_falls_back(rng):
    from msv_tpu.parallel.wirepack import pack_f32

    assert pack_f32(rng.standard_normal(50000).astype(np.float32)) is None


def test_streaming_f32_pack_matches_raw(rng):
    """Float tracks: transfer='pack' (ordered-float codec) must be
    bitwise-identical to 'raw' through the whole streaming pipeline."""
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window

    p = derive_stft_params(8000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(8000, p.n_fft)
    t = np.arange(8000 * 40) / 8000
    # int16-origin float: the compressible case
    wav = (
        np.round(np.clip(9830 * np.sin(2 * np.pi * 300 * t)
                         + 200 * rng.standard_normal(len(t)), -32768, 32767))
        .astype(np.int16).astype(np.float32) / np.float32(32768.0)
    )
    kw = dict(chunk_frames=256, seg_chunks=4)
    db_r, nf_r, lo_r, hi_r = streaming_spec_db(
        wav, p.win_length, p.hop_length, c, s, fb, transfer="raw", **kw)
    db_p, nf_p, lo_p, hi_p = streaming_spec_db(
        wav, p.win_length, p.hop_length, c, s, fb, transfer="pack", **kw)
    assert nf_r == nf_p and lo_r == lo_p and hi_r == hi_p
    np.testing.assert_array_equal(np.asarray(db_r), np.asarray(db_p))


def test_streaming_scaled_carrier_matches_f32(rng):
    """int32 carrier with a non-default shift (24-bit-origin) must equal
    the f32 pipeline bit-for-bit via the traced scale."""
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window

    p = derive_stft_params(8000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(8000, p.n_fft)
    t = np.arange(8000 * 30) / 8000
    k = np.round(
        np.clip((1 << 22) * np.sin(2 * np.pi * 250 * t)
                + 3000 * rng.standard_normal(len(t)),
                -(1 << 23), (1 << 23) - 1)
    ).astype(np.int32)
    f32 = k.astype(np.float32) * np.float32(2.0**-23)
    kw = dict(chunk_frames=256, seg_chunks=4)
    db_i, nf_i, lo_i, hi_i = streaming_spec_db(
        k, p.win_length, p.hop_length, c, s, fb, scale=2.0**-23, **kw)
    db_f, nf_f, lo_f, hi_f = streaming_spec_db(
        f32, p.win_length, p.hop_length, c, s, fb, **kw)
    assert nf_i == nf_f and lo_i == lo_f and hi_i == hi_f
    np.testing.assert_array_equal(np.asarray(db_i), np.asarray(db_f))


# ---------------------------------------------------------------- downlink


def _spec_like(rng, f=1200, n_out=96):
    """Realistic dB spectrogram: smooth tonal ridges + noise floor."""
    t = np.arange(f)[:, None] / 100.0
    m = np.arange(n_out)[None, :] / n_out
    db = (
        -90.0
        + 40.0 * np.exp(-((m - 0.3 - 0.1 * np.sin(t)) ** 2) / 0.002)
        + 25.0 * np.exp(-((m - 0.7) ** 2) / 0.01) * (0.5 + 0.5 * np.sin(2 * t))
        + 3.0 * rng.standard_normal((f, n_out))
    )
    return np.clip(db, -120.0, 0.0).astype(np.float32)


@pytest.mark.parametrize("bits", [16, 12, 10, 8])
def test_pack_spec_downlink_roundtrip(rng, bits):
    """Device pack -> host unpack must land within the documented grid
    error of the original, deterministically."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        fetch_packed_prefix,
        pack_spec_device,
        unpack_spec_np,
    )

    db = _spec_like(rng)
    f, n_out = db.shape
    lo, hi = float(db.min()), float(db.max())
    words, widths, nused = pack_spec_device(
        jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=bits
    )
    wp = fetch_packed_prefix(words, int(np.asarray(nused)))
    out = unpack_spec_np(wp, np.asarray(widths), f, n_out, f, lo, hi, bits)
    assert out.shape == db.shape and out.dtype == np.float32
    bound = 0.5 * (hi - lo) / ((1 << bits) - 1) + 1e-4
    assert np.abs(out - db).max() <= bound
    # deterministic
    words2, widths2, nused2 = pack_spec_device(
        jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=bits
    )
    out2 = unpack_spec_np(
        fetch_packed_prefix(words2, int(np.asarray(nused2))),
        np.asarray(widths2), f, n_out, f, lo, hi, bits,
    )
    np.testing.assert_array_equal(out, out2)
    # the packed stream must actually compress a realistic spectrogram
    packed_bytes = int(np.asarray(nused)) * 4 + np.asarray(widths).nbytes
    assert packed_bytes < db.nbytes / 2.0


def test_pack_spec_downlink_padded_frames(rng):
    """Bucketed frame padding (garbage rows past n_frames) must not leak
    into the unpacked result."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        fetch_packed_prefix,
        pack_spec_device,
        unpack_spec_np,
    )

    db = _spec_like(rng, f=700)
    f_pad = 768
    full = np.full((f_pad, db.shape[1]), -360.0, np.float32)
    full[:700] = db
    lo, hi = float(db.min()), float(db.max())
    words, widths, nused = pack_spec_device(
        jnp.asarray(full), jnp.float32(lo), jnp.float32(hi), bits=16
    )
    out = unpack_spec_np(
        fetch_packed_prefix(words, int(np.asarray(nused))),
        np.asarray(widths), 700, db.shape[1], f_pad, lo, hi, 16,
    )
    assert out.shape == db.shape
    assert np.abs(out - db).max() <= 0.5 * (hi - lo) / 65535 + 1e-4


def test_pack_spec_downlink_degenerate_range():
    """Constant spectrogram (lo == hi) must not divide by zero."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        fetch_packed_prefix,
        pack_spec_device,
        unpack_spec_np,
    )

    db = np.full((256, 32), -50.0, np.float32)
    words, widths, nused = pack_spec_device(
        jnp.asarray(db), jnp.float32(-50.0), jnp.float32(-50.0), bits=16
    )
    out = unpack_spec_np(
        fetch_packed_prefix(words, int(np.asarray(nused))),
        np.asarray(widths), 256, 32, 256, -50.0, -50.0, 16,
    )
    np.testing.assert_array_equal(out, db)


def test_spec_unpack_native_matches_numpy(rng):
    """The C single-pass unpack must reproduce the numpy oracle
    bit-for-bit (decode, cumsum, dequant — including f32 division)."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        _native_lib,
        fetch_packed_prefix,
        pack_spec_device,
        unpack_spec_np,
    )

    if _native_lib() is None:
        pytest.skip("native lib not built")
    for bits, f, n_out, n_frames in [(10, 1280, 96, 1200), (16, 512, 33, 500)]:
        db = _spec_like(rng, f=f, n_out=n_out)
        lo, hi = float(db.min()), float(db.max())
        words, widths, nused = pack_spec_device(
            jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=bits
        )
        wp = fetch_packed_prefix(words, int(np.asarray(nused)))
        wh = np.asarray(widths)
        a = unpack_spec_np(wp, wh, n_frames, n_out, f, lo, hi, bits,
                           native=True)
        b = unpack_spec_np(wp, wh, n_frames, n_out, f, lo, hi, bits,
                           native=False)
        np.testing.assert_array_equal(a, b, err_msg=f"bits={bits}")


@pytest.mark.parametrize("nchunks", [1, 2, 4, 7])
def test_spec_stream_unpack_matches_oracle(rng, nchunks):
    """The pipelined chunked-fetch decoder must equal the one-shot numpy
    oracle bit-for-bit for any chunking (blocks straddle chunk seams)."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        _native_lib,
        fetch_packed_prefix,
        fetch_unpack_spec_stream,
        pack_spec_device,
        unpack_spec_np,
    )

    if _native_lib() is None:
        pytest.skip("native lib not built")
    db = _spec_like(rng, f=1536, n_out=97)
    f, n_out = db.shape
    lo, hi = float(db.min()), float(db.max())
    words, widths, nused = pack_spec_device(
        jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=10
    )
    wh = np.asarray(widths)
    nuv = int(np.asarray(nused))
    expect = unpack_spec_np(
        fetch_packed_prefix(words, nuv), wh, 1500, n_out, f, lo, hi, 10,
        native=False,
    )
    got = fetch_unpack_spec_stream(
        words, wh, nuv, 1500, n_out, f, lo, hi, 10, nchunks=nchunks
    )
    np.testing.assert_array_equal(got, expect)


def test_spec_downlink_edge_shapes(rng):
    """Tiny/odd spectrogram shapes through the full downlink path."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        fetch_unpack_spec_stream,
        pack_spec_device,
    )

    for f, n_out, n_frames in [(1, 1, 1), (3, 2, 2), (256, 1, 250),
                               (8, 513, 8)]:
        db = (rng.standard_normal((f, n_out)) * 20 - 60).astype(np.float32)
        lo, hi = float(db.min()), float(db.max())
        words, widths, nused = pack_spec_device(
            jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=10
        )
        out = fetch_unpack_spec_stream(
            words, np.asarray(widths), int(np.asarray(nused)),
            n_frames, n_out, f, lo, hi, 10,
        )
        assert out.shape == (n_frames, n_out)
        bound = 0.5 * (hi - lo) / 1023 + 1e-4 if hi > lo else 1e-4
        assert np.abs(out - db[:n_frames]).max() <= bound, (f, n_out)


def test_spec_downlink_random_fuzz(rng):
    """Random windows/shapes: quantized round-trip stays within the grid
    bound for every bits setting and chunking."""
    import jax.numpy as jnp

    from msv_tpu.parallel.wirepack import (
        fetch_unpack_spec_stream,
        pack_spec_device,
    )

    for trial in range(6):
        f = int(rng.integers(2, 700))
        n_out = int(rng.integers(1, 80))
        bits = int(rng.choice([8, 10, 12, 16]))
        db = (rng.standard_normal((f, n_out)) * rng.uniform(0.1, 50)
              - rng.uniform(0, 100)).astype(np.float32)
        lo, hi = float(db.min()), float(db.max())
        words, widths, nused = pack_spec_device(
            jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=bits
        )
        out = fetch_unpack_spec_stream(
            words, np.asarray(widths), int(np.asarray(nused)), f, n_out, f,
            lo, hi, bits, nchunks=int(rng.integers(1, 6)),
        )
        bound = 0.5 * (hi - lo) / ((1 << bits) - 1) + 1e-4
        assert np.abs(out - db).max() <= bound, (trial, f, n_out, bits)


def test_spec_unpack_row_parallel_matches_single_thread(rng, monkeypatch):
    """The row-parallel decode (threads over row-aligned value ranges)
    must be bit-identical to the single-thread walk for every entry
    point: rows never interact (first frame absolute), so the split is
    exact, not approximate."""
    import jax.numpy as jnp

    import msv_tpu.parallel.wirepack as wp

    from msv_tpu.parallel.wirepack import pack_spec_device

    if wp._native_lib() is None:
        pytest.skip("native lib not built")
    db = _spec_like(rng, f=1536, n_out=97)
    f, n_out = db.shape
    lo, hi = float(db.min()), float(db.max())
    words, widths, nused = pack_spec_device(
        jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=10
    )
    wh = np.asarray(widths)
    nuv = int(np.asarray(nused))
    prefix = wp.fetch_packed_prefix(words, nuv)
    expect = wp.unpack_spec_np(prefix, wh, 1500, n_out, f, lo, hi, 10,
                               native=False)

    monkeypatch.setattr(wp, "_MT_MIN_VALS", 0)
    for nthreads in (2, 3, 5):
        monkeypatch.setattr(wp, "DECODE_THREADS", nthreads)
        got = wp.unpack_spec_np(prefix, wh, 1500, n_out, f, lo, hi, 10,
                                native=True)
        np.testing.assert_array_equal(got, expect, err_msg=f"nt={nthreads}")
        # the full pipelined fetch path with threaded chunk decodes
        got2 = wp.fetch_unpack_spec_stream(
            words, wh, nuv, 1500, n_out, f, lo, hi, 10, nchunks=3
        )
        np.testing.assert_array_equal(got2, expect, err_msg=f"nt={nthreads}")


def test_spec_decode_range_carry_chaining(rng, monkeypatch):
    """Chained _decode_range_mt calls split at NON-row-aligned points must
    reproduce the one-shot decode: the persistent carry hands (col, acc)
    across the seam, and threaded interior segments restart at row
    boundaries."""
    import ctypes as c

    import jax.numpy as jnp

    import msv_tpu.parallel.wirepack as wp

    from msv_tpu.parallel.wirepack import pack_spec_device

    lib = wp._native_lib()
    if lib is None:
        pytest.skip("native lib not built")
    wp._ensure_spec_types(lib)
    db = _spec_like(rng, f=640, n_out=37)
    f, n_out = db.shape
    lo, hi = float(db.min()), float(db.max())
    words, widths, nused = pack_spec_device(
        jnp.asarray(db), jnp.float32(lo), jnp.float32(hi), bits=12
    )
    wh = np.asarray(widths, dtype=np.int32)
    nb = len(wh)
    prefix = np.pad(
        np.ascontiguousarray(wp.fetch_packed_prefix(words, int(np.asarray(nused)))),
        (0, 2),
    )
    wpb = wh.astype(np.int64) * (wp.BLOCK // 32)
    start_word = np.zeros(nb, np.int64)
    np.cumsum(wpb[:-1], out=start_word[1:])
    n_vals = n_out * f
    v_end = nb * wp.BLOCK

    bufp = prefix.ctypes.data_as(c.POINTER(c.c_uint32))
    wip = wh.ctypes.data_as(c.POINTER(c.c_int32))
    swp = start_word.ctypes.data_as(c.POINTER(c.c_int64))

    def decode(splits, nthreads):
        q = np.zeros(n_vals, np.uint16)
        qp = q.ctypes.data_as(c.POINTER(c.c_uint16))
        carry = np.zeros(2, np.int64)
        edges = [0] + splits + [v_end]
        for a, b in zip(edges[:-1], edges[1:]):
            wp._decode_range_mt(lib, bufp, wip, swp, qp, a, b, n_vals, f,
                                carry, nthreads)
        return q

    monkeypatch.setattr(wp, "_MT_MIN_VALS", 0)
    base = decode([], 1)
    # seams chosen off row and block boundaries
    for splits in ([f * 3 + 17], [1023], [5, f + 1, 9 * f + 511]):
        for nthreads in (1, 4):
            got = decode(list(splits), nthreads)
            np.testing.assert_array_equal(
                got, base, err_msg=f"splits={splits} nt={nthreads}"
            )
