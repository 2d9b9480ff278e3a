"""v2 wire codec (per-block LPC + patched widths; round-5 VERDICT #4).

Contract: pack_int2/pack_best are LOSSLESS for every int16/int32/f32
stream (round-trip bit-exact through both the numpy oracle unpack and the
device unpack), never larger than the v1 choice (the candidate set
includes the v1 plan), and measurably smaller on the workloads that
motivated them — the bench harmonic signal and real music (the VERDICT
"done" fixtures).  The native C packer (wirepack2.cc) must emit a valid
stream with byte cost within 2% of the numpy oracle's plan (byte-identity
is NOT contractual for v2: float64 summation order in the LPC fit is an
encoder freedom — see the wirepack2.cc header).
"""

import numpy as np
import pytest

from msv_tpu.parallel.wirepack import (
    BLOCK,
    PackedPCM,
    PackedPCM2,
    pack_best,
    pack_int,
    pack_int2,
    unpack2_jax,
    unpack2_np,
)


def _signals(rng):
    t = np.arange(200000) / 48000.0
    return {
        "harmonic": np.round(
            20000 * (0.5 * np.sin(2 * np.pi * 220 * t)
                     + 0.25 * np.sin(2 * np.pi * 440 * t))
            + 50 * rng.standard_normal(len(t))),
        "clicky": np.round(18000 * np.sin(2 * np.pi * 440 * t))
        + np.where(np.arange(len(t)) % 9973 == 0, 7000, 0),
        "quiet_noise": np.round(250 * rng.standard_normal(150000)),
        "steps": np.repeat(
            rng.integers(-30000, 30000, 200), 997).astype(np.float64),
        "odd_len": rng.integers(-800, 800, BLOCK * 5 + 331).astype(
            np.float64),
        "alt_extremes": np.where(
            np.arange(BLOCK * 4) % 2 == 0, 32767, -32768).astype(
            np.float64),
    }


def _rt_equal(y, x):
    y = np.asarray(y)
    if x.dtype == np.float32:
        return np.array_equal(y.view(np.uint32), x.view(np.uint32))
    return np.array_equal(y, x)


@pytest.mark.parametrize("name", list(_signals(np.random.default_rng(0))))
@pytest.mark.parametrize("native", [False, None])
def test_roundtrip_i16(rng, name, native):
    x = np.clip(_signals(rng)[name], -32768, 32767).astype(np.int16)
    p = pack_int2(x, native=native) if native is False else pack_best(x)
    if p is None:
        return  # raw fallback is always lossless
    assert _rt_equal(unpack2_np(p), x)
    assert _rt_equal(unpack2_jax(p), x)


@pytest.mark.parametrize("native", [False, None])
def test_roundtrip_i32_full_range(rng, native):
    base = rng.integers(-2**31, 2**31, BLOCK * 6).astype(np.int32)
    ramp = (np.arange(BLOCK * 6, dtype=np.int64) * 7919 - 2**30).astype(
        np.int32)
    for x in (ramp, (base // 65536 * 65536).astype(np.int32)):
        p = pack_int2(x, native=native) if native is False else pack_best(x)
        if p is None:
            continue
        assert _rt_equal(unpack2_np(p), x)
        assert _rt_equal(unpack2_jax(p), x)


def test_roundtrip_f32_special_values(rng):
    x = (0.1 * np.sin(np.arange(BLOCK * 5) / 50.0)).astype(np.float32)
    x[100] = np.inf
    x[200] = -np.inf
    x[300] = np.nan
    x[400] = -0.0
    x[500] = np.float32(1e-42)  # denormal
    p = pack_best(x)
    if p is None:
        pytest.skip("raw fallback (valid)")
    assert _rt_equal(unpack2_np(p), x)
    assert _rt_equal(unpack2_jax(p), x)


def test_fuzz_random_walks_roundtrip(rng):
    for trial in range(8):
        scale = 10 ** rng.integers(0, 5)
        x = np.cumsum(rng.integers(-scale, scale + 1, BLOCK * 4 + 77)
                      ).astype(np.int32)
        for cast in (np.int32,):
            xx = x.astype(cast)
            for native in (False, None):
                p = (pack_int2(xx, native=False) if native is False
                     else pack_best(xx))
                if p is None:
                    continue
                assert _rt_equal(unpack2_np(p), xx), (trial, native)
                assert _rt_equal(unpack2_jax(p), xx), (trial, native)


def test_v2_cost_never_worse_than_v1(rng):
    """The candidate set contains the v1 plan, so the chosen pack is
    never larger (modulo None = raw on both sides)."""
    for name, sig in _signals(rng).items():
        x = np.clip(sig, -32768, 32767).astype(np.int16)
        p1 = pack_int(x, native=False)
        p2 = pack_int2(x, native=False)
        b1 = p1.nbytes if p1 is not None else x.nbytes
        b2 = p2.nbytes if p2 is not None else x.nbytes
        assert b2 <= b1 * 1.001 + 16, (name, b1, b2)


def test_v2_beats_v1_on_the_motivating_fixtures(rng):
    """bench-harmonic and real music: the VERDICT workloads."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import realistic_audio

    x = realistic_audio(30.0)
    p1 = pack_int(x, native=False)
    p2 = pack_best(x)
    assert p2 is not None and p1 is not None
    assert p2.nbytes < 0.97 * p1.nbytes, (p2.nbytes, p1.nbytes)
    assert _rt_equal(unpack2_jax(p2), x)

    import wave

    w = wave.open("/root/reference/samples/sample_44k1.wav")
    m = np.frombuffer(w.readframes(500000), np.int16).copy()
    q1 = pack_int(m, native=False)
    q2 = pack_best(m)
    assert isinstance(q2, PackedPCM2) and q2.pred == "lpc"
    assert q2.nbytes < 0.94 * q1.nbytes, (q2.nbytes, q1.nbytes)
    assert _rt_equal(unpack2_jax(q2), m)


def test_native_matches_numpy_plan_cost(rng):
    """C packer streams are valid (lossless both unpackers) and within 2%
    of the numpy plan's byte cost on every fixture that packs."""
    for name, sig in _signals(rng).items():
        x = np.clip(sig, -32768, 32767).astype(np.int16)
        pn = pack_int2(x, native=False)
        pc = pack_best(x)
        if pn is None or pc is None:
            continue
        assert pc.nbytes <= pn.nbytes * 1.02 + 64, (
            name, pc.nbytes, pn.nbytes)
        assert _rt_equal(unpack2_np(pc), x), name


def test_exception_capacity_is_bucketed(rng):
    """exc arrays land on the static ladder (program-cache discipline)."""
    from msv_tpu.parallel.wirepack import _exc_cap_ladder

    x = np.clip(_signals(rng)["clicky"], -32768, 32767).astype(np.int16)
    p = pack_int2(x, native=False)
    if isinstance(p, PackedPCM2) and len(p.exc_idx):
        nv = -(-p.n // BLOCK) * BLOCK
        assert len(p.exc_idx) in _exc_cap_ladder(nv)


def test_streaming_auto_uses_v2_and_matches_pack1(rng):
    """The hour path: transfer='auto' (v2 wire) and 'pack1' (v1 wire)
    produce the IDENTICAL spectrogram — the codec is transparent."""
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db

    sr = 16000
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(sr, p.n_fft)
    t = np.arange(sr * 3) / sr
    wav = np.round(
        18000 * np.sin(2 * np.pi * 330 * t)
        + 40 * rng.standard_normal(len(t))).astype(np.int16)
    a = streaming_spec_db(wav, p.win_length, p.hop_length, c, s, fb,
                          chunk_frames=256, transfer="auto")
    b = streaming_spec_db(wav, p.win_length, p.hop_length, c, s, fb,
                          chunk_frames=256, transfer="pack1")
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert a[1:] == b[1:]


@pytest.mark.parametrize("n", [1025, 2049, 2050, 5122])
def test_grid_shorter_than_n_edge_lengths(rng, n):
    """n % BLOCK in {1, 2} with delta order >= that: the v1 grid covers
    n - order residuals, SHORTER than n, and the device switch branches
    traced mismatched shapes (review repro at n=2049).  The unpacker now
    pads the dense stream statically; every packer round-trips."""
    from msv_tpu.parallel.wirepack import unpack_jax

    t = np.arange(n) / 48000.0
    x = (np.round(18000 * np.sin(2 * np.pi * 220 * t))
         + rng.integers(-20, 21, n)).astype(np.int16)
    for packer in (lambda a: pack_int(a, native=False), pack_int,
                   lambda a: pack_int2(a, native=False), pack_best):
        p = packer(x)
        if p is None:
            continue
        assert _rt_equal(unpack2_jax(p), x)
        assert _rt_equal(unpack2_np(p), x)
        if isinstance(p, PackedPCM):
            assert _rt_equal(unpack_jax(p), x)
