"""YIN pitch tracking (ops/pitch.py) vs a from-scratch oracle.

librosa is not in this image; the oracle below implements the same YIN
spec (difference function by direct summation, CMND, first trough below
threshold with lowest-trough fallback, parabolic interpolation) with
plain numpy loops, so agreement pins the GEMM/cumsum formulation, not a
shared implementation.
"""

import math

import numpy as np
import pytest

from msv_tpu.ops.pitch import yin


def _yin_oracle(x, sr, fmin, fmax, frame_length, win_length, hop,
                threshold):
    half = frame_length // 2
    n = len(x)
    n_frames = 1 + (n + 2 * half - frame_length) // hop
    padded = np.zeros((n_frames - 1) * hop + frame_length + hop,
                      np.float64)
    padded[half:half + n] = x
    pmin = max(int(math.floor(sr / fmax)), 1)
    pmax = min(int(math.ceil(sr / fmin)), frame_length - win_length - 1)
    f0s, aps = [], []
    for fi in range(n_frames):
        fr = padded[fi * hop: fi * hop + frame_length]
        d = np.zeros(pmax + 1)
        for tau in range(pmax + 1):
            diff = fr[:win_length] - fr[tau:tau + win_length]
            d[tau] = (diff * diff).sum()
        cmnd = np.ones(pmax + 1)
        cum = np.cumsum(d)
        for tau in range(1, pmax + 1):
            cmnd[tau] = d[tau] * tau / max(cum[tau], 1e-12)
        troughs = [t for t in range(max(pmin, 1), pmax)
                   if cmnd[t] < cmnd[t - 1] and cmnd[t] <= cmnd[t + 1]]
        below = [t for t in troughs if cmnd[t] < threshold]
        if below:
            t = below[0]
        elif troughs:
            t = min(troughs, key=lambda q: cmnd[q])
        else:
            t = int(np.argmin(cmnd[pmin:pmax]) + pmin)
        va, vb, vc = cmnd[t - 1], cmnd[t], cmnd[t + 1]
        den = va - 2 * vb + vc
        shift = (np.clip(0.5 * (va - vc) / den, -0.5, 0.5)
                 if abs(den) > 1e-12 else 0.0)
        f0s.append(sr / (t + shift))
        aps.append(max(vb + 0.25 * (va - vc) * shift, 0.0))
    return np.array(f0s), np.array(aps)


def test_matches_from_scratch_oracle(rng):
    """Tonal + noisy mixture, small geometry so the O(n^2) oracle is
    cheap; every frame's f0 and trough depth agree."""
    sr = 8000
    t = np.arange(2400) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 660 * t + 1.0)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    kw = dict(fmin=80.0, fmax=1000.0, frame_length=512, win_length=256,
              hop_length=128, trough_threshold=0.1)
    f0, ap = (np.asarray(v) for v in yin(x, sr, with_aperiodicity=True,
                                         **kw))
    of0, oap = _yin_oracle(x.astype(np.float64), sr, 80.0, 1000.0, 512,
                           256, 128, 0.1)
    assert f0.shape == of0.shape
    np.testing.assert_allclose(f0, of0, rtol=5e-3)
    np.testing.assert_allclose(ap, oap, rtol=5e-2, atol=5e-4)


def test_pure_tones_and_aperiodicity(rng):
    sr = 16000
    t = np.arange(sr) / sr
    # tolerance scales with lag quantization: 1760 Hz is a ~9-sample
    # period at 16 kHz, so parabolic interp leaves ~0.6% bias
    for hz, tol in ((110.0, 0.005), (440.0, 0.005), (1760.0, 0.01)):
        x = (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
        f0, ap = (np.asarray(v) for v in yin(x, sr,
                                             with_aperiodicity=True))
        mid = slice(4, -4)
        err = np.abs(f0[mid] - hz) / hz
        assert np.median(err) < tol, (hz, np.median(err))
        assert np.median(ap[mid]) < 0.02
    noise = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    _, apn = yin(noise, sr, with_aperiodicity=True)
    assert float(np.median(np.asarray(apn))) > 0.5  # clearly unvoiced


def test_vibrato_is_tracked(rng):
    """f0 modulating 300 +- 30 Hz at 3 Hz: per-frame estimates follow
    the instantaneous frequency (a few % intrinsic smoothing/jitter —
    the 64 ms analysis span averages the modulation)."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    inst = 300.0 + 30.0 * np.sin(2 * np.pi * 3.0 * t)
    phase = 2 * np.pi * np.cumsum(inst) / sr
    x = (0.5 * np.sin(phase)).astype(np.float32)
    hop = 256  # frame_length//4
    f0 = np.asarray(yin(x, sr, fmin=150, fmax=800, frame_length=1024))
    centers = np.arange(len(f0)) * hop  # centered frames: pad = offset
    inst_at = np.interp(np.clip(centers, 0, len(x) - 1),
                        np.arange(len(x)), inst)
    mid = slice(4, len(f0) - 4)
    rel = np.abs(f0[mid] - inst_at[mid]) / inst_at[mid]
    # the 64 ms analysis span averages the 3 Hz modulation, so a few %
    # of smoothing is intrinsic; a constant-pitch predictor sits at ~10%
    assert np.percentile(rel, 90) < 0.04
    # and the contour really follows the modulation, not just its mean
    assert np.corrcoef(f0[mid], inst_at[mid])[0, 1] > 0.95


def test_validation():
    x = np.zeros(4000, np.float32)
    with pytest.raises(ValueError, match="fmin"):
        yin(x, 16000, fmin=500, fmax=100)
    with pytest.raises(ValueError, match="Nyquist"):
        yin(x, 8000, fmax=5000)
    with pytest.raises(ValueError, match="win_length"):
        yin(x, 16000, win_length=4096)
    with pytest.raises(ValueError, match="1-D"):
        yin(np.zeros((2, 100), np.float32), 16000)
    with pytest.raises(ValueError, match="too narrow"):
        yin(x, 16000, fmin=2000, fmax=2093)
