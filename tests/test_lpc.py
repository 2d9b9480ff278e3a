"""LPC analysis (ops/lpc.py) vs scipy normal equations + np.roots.

The batched Levinson-Durbin is pinned against scipy.linalg.solve_toeplitz
solving the SAME normal equations, the autocorrelation stage against a
direct numpy linear ACF, the envelope against numpy polynomial evaluation
on the unit circle, and formant picking against both np.roots of the same
polynomials and the synthesis ground truth of two-resonator vowels.
"""

import math

import numpy as np
import pytest
import scipy.linalg
import scipy.signal

from msv_tpu.ops.lpc import (
    _levinson,
    formant_track,
    lpc,
    lpc_envelope_db,
)


def _levinson_oracle(r, order):
    """From-scratch numpy Levinson-Durbin (one row)."""
    a = np.zeros(order + 1, np.float64)
    a[0] = 1.0
    r = r.astype(np.float64) / r[0]
    r[0] = 1.0 + 1e-6  # the device ridge
    err = r[0]
    for m in range(1, order + 1):
        acc = sum(a[i] * r[m - i] for i in range(m))
        lam = -acc / err
        a[: m + 1] = a[: m + 1] + lam * a[: m + 1][::-1]
        err *= 1.0 - lam * lam
    return a, err


def _ar_rows(rng, n_rows, order):
    """Random strictly-PD autocorrelation rows (from random spectra)."""
    rows = []
    for _ in range(n_rows):
        x = rng.standard_normal(256)
        acf = np.correlate(x, x, mode="full")[255 : 255 + order + 1]
        rows.append(acf)
    return np.asarray(rows, np.float32)


def test_levinson_vs_scipy_toeplitz(rng):
    """Batched device Levinson == scipy solve_toeplitz on the ridged
    normal equations, and the oracle agrees too."""
    order = 12
    r = _ar_rows(rng, 24, order)
    a, g2 = _levinson(r, order)
    a = np.asarray(a, np.float64)
    g2 = np.asarray(g2, np.float64)
    for i in range(r.shape[0]):
        rn = r[i].astype(np.float64) / r[i, 0]
        rn[0] = 1.0 + 1e-6
        sol = scipy.linalg.solve_toeplitz((rn[:-1], rn[:-1]), -rn[1:])
        np.testing.assert_allclose(a[i, 1:], sol, rtol=0, atol=2e-3)
        oa, oe = _levinson_oracle(r[i], order)
        np.testing.assert_allclose(a[i], oa, rtol=0, atol=2e-3)
        np.testing.assert_allclose(g2[i], oe * r[i, 0], rtol=2e-3)


def test_ar_coefficient_recovery(rng):
    """LPC on a long frame of a known AR(4) process recovers the filter."""
    true_a = np.array([1.0, -1.2, 0.8, -0.3, 0.1])
    n = 1 << 15
    x = scipy.signal.lfilter([1.0], true_a, rng.standard_normal(n))
    x = (x / np.abs(x).max()).astype(np.float32)
    a, g2, hop = lpc(x, order=4, frame_length=4096)
    a = np.asarray(a)
    # interior frames (fully inside the signal) all recover the truth
    inner = a[4:-4]
    med = np.median(inner, axis=0)
    np.testing.assert_allclose(med, true_a, rtol=0, atol=0.05)
    assert np.asarray(g2)[4:-4].min() > 0


def test_autocorrelation_stage_matches_direct(rng):
    """One frame, order 8: the device normal equations (recovered by
    re-solving with the direct windowed numpy ACF) give the same
    coefficients — pins the Wiener-Khinchin GEMM formulation."""
    order = 8
    frame_length = 512
    x = rng.standard_normal(frame_length).astype(np.float32)
    # single centered frame: pad half a frame on each side, take frame 2
    a, _, _ = lpc(x, order=order, frame_length=frame_length,
                  hop_length=frame_length // 4)
    a = np.asarray(a)
    w = np.hamming(frame_length + 1)[:-1]  # periodic, = windows.hamming
    fi = 2  # frame starting exactly at the signal (offset half - 2*hop)
    start = fi * (frame_length // 4) - frame_length // 2
    seg = np.zeros(frame_length)
    s0, s1 = max(0, start), min(frame_length, start + frame_length)
    seg[s0 - start : s1 - start] = x[s0:s1]
    xw = seg * w
    acf = np.correlate(xw, xw, mode="full")[
        frame_length - 1 : frame_length + order
    ]
    rn = acf / acf[0]
    rn[0] = 1.0 + 1e-6
    sol = scipy.linalg.solve_toeplitz((rn[:-1], rn[:-1]), -rn[1:])
    np.testing.assert_allclose(a[fi, 1:], sol, rtol=0, atol=5e-3)


def test_envelope_matches_polyval(rng):
    """Envelope grid == g2 / |A(e^{jw})|^2 via np.polyval on the same
    coefficients, and the AR process's envelope peaks at the AR PSD."""
    true_a = np.array([1.0, -0.5, 0.6])
    n = 1 << 14
    x = scipy.signal.lfilter([1.0], true_a, rng.standard_normal(n))
    x = (x / np.abs(x).max()).astype(np.float32)
    env_db, hop = lpc_envelope_db(x, 16000, order=2, frame_length=2048,
                                  n_grid=257)
    env_db = np.asarray(env_db)
    a, g2, _ = lpc(x, order=2, frame_length=2048)
    a = np.asarray(a, np.float64)
    g2 = np.asarray(g2, np.float64)
    w = np.linspace(0, np.pi, 257)
    fi = 8
    aw = np.polyval(a[fi][::-1], np.exp(1j * w)) / np.exp(1j * w * 0)
    # A(e^{jw}) = sum_k a_k e^{-jwk} = polyval(a[::-1], z) / z^p with
    # z = e^{jw}; |.| is unaffected by the z^p rotation
    ref = 10 * np.log10(g2[fi] / np.abs(aw) ** 2)
    np.testing.assert_allclose(env_db[fi], ref, rtol=0, atol=1e-3)


def test_formants_two_resonator_vowel(rng):
    """A pulse train through two known resonators reads back its formant
    frequencies, and the device grid picks agree with np.roots of the
    same LPC polynomials."""
    sr = 16000
    f_true = [700.0, 1800.0]
    bw = [80.0, 120.0]
    n = sr  # 1 s
    src = np.zeros(n)
    src[:: sr // 120] = 1.0  # 120 Hz glottal pulse train
    y = src
    for f0, b in zip(f_true, bw):
        r = math.exp(-math.pi * b / sr)
        th = 2 * math.pi * f0 / sr
        y = scipy.signal.lfilter([1.0], [1.0, -2 * r * math.cos(th),
                                         r * r], y)
    y = (y / np.abs(y).max()).astype(np.float32)

    f, hop_s, t0 = formant_track(y, sr, n_formants=3, fmax=4000.0)
    f = np.asarray(f)
    inner = f[5:-5]
    for k, ft in enumerate(f_true):
        med = np.nanmedian(inner[:, k])
        assert abs(med - ft) < 60.0, (k, med, ft)

    # cross-check one frame against the root method on the SAME poly
    from msv_tpu.ops.lpc import lpc as lpc_fn
    from msv_tpu.ops.resample import resample

    sr_a = 8000
    ya = np.asarray(resample(y, sr, sr_a), np.float32)
    pre = math.exp(-2 * math.pi * 50.0 / sr_a)
    a, _, _ = lpc_fn(ya, order=6,
                     frame_length=max(int(round(0.025 * sr_a)), 8),
                     hop_length=max(int(round(0.010 * sr_a)), 1),
                     preemphasis=pre)
    a = np.asarray(a, np.float64)
    fi = a.shape[0] // 2
    roots = np.roots(a[fi])
    roots = roots[np.imag(roots) > 0]
    fr = np.sort(np.angle(roots) * sr_a / (2 * np.pi))
    fr = fr[(fr > 50) & (fr < 3950)]
    for k, ft in enumerate(f_true):
        assert abs(fr[k] - ft) < 80.0, (fr, ft)
    # and the grid pick of that frame area matches the roots
    fg = np.asarray(formant_track(y, sr, n_formants=2, fmax=4000.0)[0])
    med = np.nanmedian(fg[5:-5], axis=0)
    for k in range(2):
        assert abs(med[k] - fr[k]) < 60.0, (med, fr)


def test_silence_and_validation():
    """Digital silence yields NaN formants and -inf-ish envelope; bad
    arguments raise."""
    sr = 8000
    z = np.zeros(sr // 2, np.float32)
    f, hop_s, _ = formant_track(z, sr, n_formants=2, fmax=3500.0)
    f = np.asarray(f)
    # silence: flat (ridged) envelope has no interior peaks
    assert np.isnan(f).all()
    env, _ = lpc_envelope_db(z, sr, order=4)
    assert np.asarray(env).max() < -80.0
    with pytest.raises(ValueError):
        lpc(z, order=0)
    with pytest.raises(ValueError):
        lpc(np.zeros((4, 4), np.float32), order=2)
    with pytest.raises(ValueError):
        formant_track(z, sr, n_formants=0)
    with pytest.raises(ValueError):
        formant_track(z, sr, fmax=50.0)


def test_formant_resample_path_matches_native_rate(rng):
    """A signal already at 2*fmax takes the no-resample branch and reads
    the same formants as the >2*fmax path on the same material."""
    sr_hi = 16000
    f_true = 900.0
    n = sr_hi // 2
    src = np.zeros(n)
    src[:: sr_hi // 100] = 1.0
    r = math.exp(-math.pi * 100.0 / sr_hi)
    th = 2 * math.pi * f_true / sr_hi
    y = scipy.signal.lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r],
                             src).astype(np.float32)
    y /= np.abs(y).max()
    # order 2 (n_formants=1) can't model both the pre-emphasis tilt and
    # the resonance; order 4 nails the peak — track 2, read formant 1
    fa = np.asarray(formant_track(y, sr_hi, n_formants=2,
                                  fmax=4000.0)[0])
    from msv_tpu.ops.resample import resample

    y8 = np.asarray(resample(y, sr_hi, 8000), np.float32)
    fb = np.asarray(formant_track(y8, 8000, n_formants=2,
                                  fmax=4000.0)[0])
    ma = np.nanmedian(fa[:, 0])
    mb = np.nanmedian(fb[:, 0])
    assert abs(ma - f_true) < 50.0 and abs(mb - f_true) < 50.0
    assert abs(ma - mb) < 30.0
