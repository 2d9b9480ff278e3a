"""Harmonic/percussive separation (ops/hpss.py).

The median-filter and softmask stages are pinned against scipy.ndimage
and a from-scratch oracle (librosa is not in this image); the full
audio path is checked semantically (tone goes harmonic, clicks go
percussive) and for mask-sum reconstruction.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from msv_tpu.config import SpecSetting, derive_stft_params
from msv_tpu.ops.hpss import _median_axis, hpss, hpss_masks


def _params(sr=16000):
    return derive_stft_params(sr, SpecSetting())


def _tone_and_clicks(sr=16000, seconds=1.0, rng=None):
    n = int(sr * seconds)
    t = np.arange(n) / sr
    tone = 0.4 * np.sin(2 * np.pi * 440 * t)
    clicks = np.zeros(n, np.float32)
    for c in range(sr // 8, n, sr // 4):  # a click every 250 ms
        clicks[c:c + 8] = np.float32([0.9, -0.9] * 4)
    return (tone + clicks).astype(np.float32), tone, clicks


def test_median_axis_matches_scipy(rng):
    x = rng.standard_normal((40, 33)).astype(np.float32)
    for k, axis in [(5, 0), (9, 1), (1, 0), (31, 1)]:
        size = (k, 1) if axis == 0 else (1, k)
        want = ndi.median_filter(x, size=size, mode="reflect")
        got = np.asarray(_median_axis(x, k, axis))
        np.testing.assert_allclose(got, want, atol=0.0)


def test_masks_match_softmask_oracle(rng):
    """hpss_masks vs a from-scratch median+Wiener oracle, incl. a hard
    (power=inf) variant and margin-carved residual."""
    mag = np.abs(rng.standard_normal((64, 41))).astype(np.float32)
    mag[::7] = 0.0  # zero rows exercise the split-zeros branch
    mh, mp = (np.asarray(m) for m in hpss_masks(
        mag, kernel_time=9, kernel_freq=5))
    harm = ndi.median_filter(mag, size=(9, 1), mode="reflect")
    perc = ndi.median_filter(mag, size=(1, 5), mode="reflect")

    def soft(x, ref, p=2.0):
        z = np.maximum(x, ref)
        bad = z < np.finfo(np.float32).tiny
        z = np.where(bad, 1.0, z)
        m = (x / z) ** p / ((x / z) ** p + (ref / z) ** p)
        return np.where(bad, 0.0, m)

    np.testing.assert_allclose(mh, soft(harm, perc), atol=1e-6)
    np.testing.assert_allclose(mp, soft(perc, harm), atol=1e-6)
    # hard masks are binary and disjoint
    hh, hp = (np.asarray(m) for m in hpss_masks(
        mag, kernel_time=9, kernel_freq=5, power=np.inf))
    assert set(np.unique(hh)) <= {0.0, 1.0}
    assert float((hh * hp).max()) == 0.0
    # margin > 1 carves a residual: masks sum below 1 somewhere
    rh, rp = (np.asarray(m) for m in hpss_masks(
        mag, kernel_time=9, kernel_freq=5, margin=2.0))
    s = rh + rp
    assert float(s.max()) <= 1.0 + 1e-6 and float(s.min()) < 0.9


def test_hpss_separates_tone_from_clicks(rng):
    sr, p = 16000, _params()
    mix, tone, clicks = _tone_and_clicks(sr)
    h, pc = (np.asarray(y) for y in hpss(
        mix, p.win_length, p.hop_length, p.n_fft))
    assert h.shape == pc.shape == mix.shape
    # the tone energy lands in the harmonic output...
    corr_h = np.dot(h, tone) / (np.linalg.norm(h) * np.linalg.norm(tone))
    assert corr_h > 0.97
    # ...and the harmonic output is nearly click-free: compare energy in
    # 8-sample click slots (skip the STFT's half-window edge region)
    def click_energy(y):
        e = 0.0
        for c in range(sr // 8, len(y) - 8, sr // 4):
            e += float((y[c:c + 8] ** 2).sum())
        return e

    # (the tone itself passes through the click slots, so measure the
    # click CONTRIBUTION above the tone's own slot energy)
    assert click_energy(h) - click_energy(tone) < 0.1 * click_energy(clicks)
    assert click_energy(pc) > 0.8 * click_energy(clicks)
    # tone leakage into percussive is small
    mid = slice(p.win_length, len(mix) - p.win_length)
    assert float(np.sqrt(np.mean(pc[mid] ** 2))) < 0.1


def test_hpss_soft_masks_reconstruct_the_input(rng):
    """margin=1 soft masks sum to 1 wherever the spectrogram is nonzero,
    so harmonic + percussive = input to OLA rounding."""
    sr, p = 16000, _params()
    mix, _, _ = _tone_and_clicks(sr, 0.5)
    h, pc = (np.asarray(y) for y in hpss(
        mix, p.win_length, p.hop_length, p.n_fft))
    np.testing.assert_allclose(h + pc, mix, atol=5e-5)


def test_hpss_validation():
    p = _params()
    ok = np.zeros(4000, np.float32)
    with pytest.raises(ValueError, match="odd"):
        hpss(ok, p.win_length, p.hop_length, p.n_fft, kernel_time=10)
    with pytest.raises(ValueError, match="margins"):
        hpss(ok, p.win_length, p.hop_length, p.n_fft, margin=0.5)
    with pytest.raises(ValueError, match="too small"):
        hpss(ok[:2000], p.win_length, p.hop_length, p.n_fft,
             kernel_time=101)
    with pytest.raises(ValueError, match="1-D"):
        hpss(np.zeros((2, 4000), np.float32), p.win_length, p.hop_length,
             p.n_fft)
    with pytest.raises(ValueError, match="n_freq"):
        hpss_masks(np.zeros(5, np.float32))
