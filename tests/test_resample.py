"""Rational resampler (ops/resample.py) vs the scipy oracle.

The reference never resamples (tracks compute at native rate,
lib.rs:231-248 aligns in the frequency domain); this op bridges
session audio to the 16 kHz ML frontend.  Contract: match
scipy.signal.resample_poly's default kaiser design to f32 conv
rounding, at every rational ratio the bundled rates need.
"""

import math

import numpy as np
import pytest
from scipy.signal import resample_poly as scipy_resample_poly

from msv_tpu.ops.resample import resample, resample_poly

RATES = [8000, 16000, 22050, 24000, 44100, 48000]


def _sig(n, rng, sr=48000):
    t = np.arange(n) / sr
    return (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3330 * t + 0.7)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.mark.parametrize(
    "up,down",
    [(1, 3), (1, 2), (2, 1), (3, 2), (2, 3), (160, 441), (441, 160),
     (147, 160), (80, 441)],
)
def test_matches_scipy(up, down, rng):
    x = _sig(4801, rng)
    got = np.asarray(resample_poly(x, up, down))
    want = scipy_resample_poly(x.astype(np.float64), up, down)
    assert got.shape == want.shape
    scale = float(np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=2e-5 * max(scale, 1.0),
                               rtol=0)


def test_all_bundled_rate_pairs(rng):
    """Every sr -> 16 kHz conversion the feature frontend needs, plus
    identity, at scipy-parity."""
    for sr in RATES:
        x = _sig(sr // 2, rng, sr)  # half a second
        got = np.asarray(resample(x, sr, 16000))
        g = math.gcd(sr, 16000)
        want = scipy_resample_poly(x.astype(np.float64), 16000 // g,
                                   sr // g)
        assert got.shape == want.shape == (8000,)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)
    same = np.asarray(resample(x, 16000, 16000))
    np.testing.assert_array_equal(same, x)


def test_tone_survives_downsample(rng):
    """440 Hz at 48 k stays 440 Hz (and full amplitude) at 16 k; content
    above the new Nyquist is attenuated to the stopband."""
    sr = 48000
    t = np.arange(2 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 11000 * t)).astype(np.float32)
    y = np.asarray(resample(x, sr, 16000))
    f = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    hz = f.argmax() * 16000 / len(y)
    assert abs(hz - 440.0) < 1.0
    # the 11 kHz partial (> 8 kHz Nyquist) is gone, not aliased to 5 kHz
    alias_bin = int(round(5000 * len(y) / 16000))
    tone_bin = int(round(440 * len(y) / 16000))
    assert f[alias_bin - 2:alias_bin + 3].max() < 1e-3 * f[tone_bin]
    # passband amplitude preserved
    assert abs(float(np.abs(y).max()) - 0.5) < 0.01


def test_batched_and_leading_dims(rng):
    x = rng.standard_normal((3, 2, 1000)).astype(np.float32)
    got = np.asarray(resample_poly(x, 2, 3))
    assert got.shape == (3, 2, 667)
    for i in range(3):
        for j in range(2):
            np.testing.assert_allclose(
                got[i, j],
                scipy_resample_poly(x[i, j].astype(np.float64), 2, 3),
                atol=2e-5, rtol=0)


def test_validation():
    with pytest.raises(ValueError, match="positive"):
        resample_poly(np.zeros(10, np.float32), 0, 1)
    with pytest.raises(ValueError, match="at least 2"):
        resample_poly(np.zeros(1, np.float32), 2, 1)
    with pytest.raises(ValueError, match="positive"):
        resample(np.zeros(10, np.float32), 48000, 0)


def test_streamed_matches_oneshot(rng):
    """resample_streamed == resample: bit-exact for pure downsample,
    a few f32 ulp otherwise (conv-length-dependent reassociation)."""
    from msv_tpu.ops.resample import resample_streamed

    for si, so in [(48000, 16000), (44100, 16000), (22050, 48000),
                   (8000, 44100), (44100, 44100)]:
        for n in (481, 3001, 96017):
            x = rng.standard_normal(n).astype(np.float32)
            a = np.asarray(resample(x, si, so))
            b = resample_streamed(x, si, so, seg_s=0.25)
            assert a.shape == b.shape
            if so % si == 0 or si % so == 0 or si == so:
                np.testing.assert_array_equal(a, b)
            else:
                np.testing.assert_allclose(a, b, atol=3e-6, rtol=0)


def test_streamed_multichannel_and_short(rng):
    from msv_tpu.ops.resample import resample_streamed

    x = rng.standard_normal((3, 100000)).astype(np.float32)
    a = np.asarray(resample(x, 44100, 16000))
    b = resample_streamed(x, 44100, 16000, seg_s=0.5)
    assert np.array_equal(a, b) and b.dtype == np.float32
    # shorter than one segment: falls through to the one-shot path
    y = rng.standard_normal(500).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(resample(y, 48000, 16000)),
        resample_streamed(y, 48000, 16000))
    with pytest.raises(ValueError, match="seg_s"):
        resample_streamed(y, 48000, 16000, seg_s=0.0)
    with pytest.raises(ValueError, match="positive"):
        resample_streamed(y, 48000, -1)
