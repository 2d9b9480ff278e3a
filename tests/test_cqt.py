"""Constant-Q transform (ops/cqt.py) vs a from-scratch oracle.

librosa is not in this image; the oracle re-derives the Brown-1991
spec with plain numpy per-frame loops, so agreement pins the
GEMM/kernel-bank formulation, not a shared implementation.
"""

import math

import numpy as np
import pytest

from msv_tpu.ops.cqt import cqt, cqt_frequencies


def _cqt_oracle(x, sr, fmin, n_bins, bpo, hop, filter_scale=1.0):
    q = filter_scale / (2.0 ** (1.0 / bpo) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bpo)
    lengths = np.ceil(q * sr / freqs).astype(int)
    frame_len = 1
    while frame_len < lengths[0]:
        frame_len *= 2
    half = frame_len // 2
    n_frames = 1 + len(x) // hop
    padded = np.zeros((n_frames - 1) * hop + frame_len + hop)
    padded[half:half + len(x)] = x
    out = np.zeros((n_frames, n_bins))
    for fi in range(n_frames):
        fr = padded[fi * hop: fi * hop + frame_len]
        for k in range(n_bins):
            n = int(lengths[k])
            t = np.arange(n) - (n - 1) / 2.0
            w = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
            w /= w.sum()
            seg = fr[half - n // 2: half - n // 2 + n]
            z = (seg * w * np.exp(-2j * np.pi * freqs[k] * t / sr)).sum()
            out[fi, k] = abs(z)
    return out


def test_matches_from_scratch_oracle(rng):
    """Small geometry (2 octaves up from 220 Hz) so the oracle is cheap;
    every frame x bin agrees."""
    sr = 8000
    t = np.arange(3000) / sr
    x = (0.5 * np.sin(2 * np.pi * 330 * t)
         + 0.2 * np.sin(2 * np.pi * 660 * t + 0.3)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    got = np.asarray(cqt(x, sr, fmin=220.0, n_bins=24, bins_per_octave=12,
                         hop_length=256))
    want = _cqt_oracle(x.astype(np.float64), sr, 220.0, 24, 12, 256)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tones_land_in_their_bins(rng):
    """Semitone tones peak in consecutive bins at ~0.5 for a unit tone;
    constant-Q: the SAME relative bandwidth at every octave."""
    sr = 16000
    t = np.arange(sr) / sr
    freqs = cqt_frequencies(n_bins=84)
    for k in (24, 36, 48, 60):  # C3..C7
        x = np.sin(2 * np.pi * float(freqs[k]) * t).astype(np.float32)
        out = np.asarray(cqt(x, sr))
        prof = out[4:-4].mean(axis=0)
        assert prof.argmax() == k
        assert abs(prof[k] - 0.5) < 0.02
        # constant Q: the -3 octave-relative response is symmetric-ish
        # and bins one octave away are far down
        assert prof[k - 12] < 0.05 and prof[min(k + 12, 83)] < 0.05


def test_batch_device_and_validation(rng):
    import jax.numpy as jnp

    sr = 8000
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    host = np.asarray(cqt(x, sr, fmin=220.0, n_bins=24, hop_length=256))
    dev = np.asarray(cqt(jnp.asarray(x), sr, fmin=220.0, n_bins=24,
                         hop_length=256))
    assert host.shape == (2, 4000 // 256 + 1, 24)
    np.testing.assert_allclose(host, dev, atol=1e-6)
    with pytest.raises(ValueError, match="Nyquist"):
        cqt(x, sr, n_bins=96)  # 8 octaves from C1 tops out ~7.9 kHz
    with pytest.raises(ValueError, match="positive"):
        cqt(x, sr, fmin=-1.0, n_bins=12)
    with pytest.raises(ValueError, match="hop_length"):
        cqt(x, sr, n_bins=24, fmin=220.0, hop_length=0)
    with pytest.raises(ValueError, match="must be"):
        cqt(np.zeros((1, 2, 3), np.float32), sr, fmin=220.0, n_bins=12)
