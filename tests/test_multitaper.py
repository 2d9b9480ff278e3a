"""Multitaper spectrogram (ops/multitaper.py) vs a from-scratch oracle.

Neither librosa nor nitime is in this image; the oracle recomputes the
Thomson estimate with per-frame numpy rffts over scipy's DPSS tapers,
so agreement pins the stacked-GEMM formulation, not a shared code
path.
"""

import numpy as np
import pytest
from scipy.signal import windows as sw

from msv_tpu.ops.multitaper import (multitaper_spec_db,
                                    multitaper_spectrogram)


def _mt_oracle(x, win, hop, n_fft, nw, k):
    tapers, lam = sw.dpss(win, nw, Kmax=k, sym=False, norm=2,
                          return_ratios=True)
    tapers = np.atleast_2d(tapers).astype(np.float64)
    lam = lam / lam.sum()
    half = win // 2
    padded = np.pad(x, (half, half), mode="reflect")
    n_frames = 1 + (len(x) + 2 * half - win) // hop
    pl = (n_fft - win) // 2
    out = np.zeros((n_frames, n_fft // 2 + 1))
    for fi in range(n_frames):
        fr = padded[fi * hop: fi * hop + win]
        for j in range(tapers.shape[0]):
            buf = np.zeros(n_fft)
            buf[pl:pl + win] = fr * tapers[j]
            out[fi] += lam[j] * np.abs(np.fft.rfft(buf)) ** 2
    return out


def test_matches_from_scratch_oracle(rng):
    sr = 8000
    t = np.arange(4000) / sr
    x = (0.6 * np.sin(2 * np.pi * 525.3 * t)
         + 0.1 * rng.standard_normal(len(t))).astype(np.float32)
    got = np.asarray(multitaper_spectrogram(
        x, sr, win_length=256, hop_length=128, n_fft=512, nw=3.0,
        n_tapers=5))
    want = _mt_oracle(x.astype(np.float64), 256, 128, 512, 3.0, 5)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-7)


def test_variance_reduction_on_white_noise(rng):
    """The point of the estimator: ~K-fold variance cut on a flat
    spectrum at unchanged mean level (tapers are unit-energy)."""
    x = rng.standard_normal(32768).astype(np.float32)
    one = np.asarray(multitaper_spectrogram(
        x, 16000, win_length=512, hop_length=256, nw=3.0, n_tapers=1))
    five = np.asarray(multitaper_spectrogram(
        x, 16000, win_length=512, hop_length=256, nw=3.0, n_tapers=5))
    # interior bins only (DC/Nyquist halve the dof)
    one, five = one[:, 5:-5], five[:, 5:-5]
    assert np.isclose(five.mean(), one.mean(), rtol=0.05)
    r = five.std() / one.std()
    assert r < 0.55, f"expected ~1/sqrt(5) variance ratio, got std x{r}"


def test_tone_peaks_at_its_bin(rng):
    sr = 16000
    n_fft = 1024
    f0 = 2000.0  # exactly bin 128
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    p = np.asarray(multitaper_spectrogram(x, sr, win_length=1024,
                                          hop_length=256))
    mid = p[p.shape[0] // 2]
    assert int(np.argmax(mid)) == round(f0 / sr * n_fft)


def test_batch_matches_solo(rng):
    xs = rng.standard_normal((3, 3000)).astype(np.float32)
    b = np.asarray(multitaper_spectrogram(xs, 8000, win_length=256,
                                          hop_length=128))
    for i in range(3):
        s = np.asarray(multitaper_spectrogram(xs[i], 8000, win_length=256,
                                              hop_length=128))
        np.testing.assert_array_equal(b[i], s)


def test_db_view_and_top_db(rng):
    x = rng.standard_normal(3000).astype(np.float32)
    db = np.asarray(multitaper_spec_db(x, 8000, win_length=256,
                                       hop_length=128, top_db=40.0))
    assert db.max() - db.min() <= 40.0 + 1e-5
    with pytest.raises(ValueError):
        multitaper_spec_db(x, 8000, win_length=256, top_db=-3.0)


def test_argument_validation(rng):
    x = rng.standard_normal(3000).astype(np.float32)
    with pytest.raises(ValueError):
        multitaper_spectrogram(x, 8000, win_length=256, n_fft=128)
    with pytest.raises(ValueError):
        multitaper_spectrogram(x, 8000, nw=0.25)
    with pytest.raises(ValueError):  # over the 2NW-1 concentration count
        multitaper_spectrogram(x, 8000, nw=2.0, n_tapers=6)
    with pytest.raises(ValueError):
        multitaper_spectrogram(x, 8000, win_length=256, hop_length=0)
    with pytest.raises(ValueError):
        multitaper_spectrogram(np.zeros(10, np.float32), 8000,
                               win_length=1024)
    with pytest.raises(ValueError):
        multitaper_spectrogram(np.zeros((2, 2, 10), np.float32), 8000)
