"""General filtering (ops/filter.py) vs scipy oracles.

Design parity pins the TRANSFER FUNCTION (any section pairing is the
same filter); execution parity pins filtered outputs against scipy's
f64 direct forms; the chunked path is pinned exactly against the
one-shot scan.  No reference counterpart — `thesia` ships no EQ.
"""

import numpy as np
import pytest
import scipy.signal as ss

from msv_tpu.ops.filter import (
    butter_sos,
    filtfilt,
    fir_filter,
    firwin,
    high_shelf,
    low_shelf,
    notch,
    peaking_eq,
    sos_response,
    sosfilt,
    sosfilt_streamed,
    sosfilt_zi_step,
)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 6, 8])
@pytest.mark.parametrize("btype,cutoff", [
    ("lowpass", 2000.0),
    ("highpass", 500.0),
    ("bandpass", (300.0, 3000.0)),
    ("bandstop", (300.0, 3000.0)),
])
def test_butter_design_matches_scipy_response(order, btype, cutoff):
    sr = 16000
    freqs = np.linspace(1, sr / 2 - 1, 400)
    mine = sos_response(butter_sos(order, cutoff, btype, sr=sr), freqs, sr)
    ref = np.abs(ss.sosfreqz(
        ss.butter(order, cutoff, btype, fs=sr, output="sos"),
        worN=freqs, fs=sr)[1])
    np.testing.assert_allclose(mine, ref, atol=1e-9)


def test_butter_rejects_bad_args():
    with pytest.raises(ValueError):
        butter_sos(0, 100.0, "lowpass", sr=16000)
    with pytest.raises(ValueError):
        butter_sos(4, 9000.0, "lowpass", sr=16000)
    with pytest.raises(ValueError):
        butter_sos(4, (3000.0, 300.0), "bandpass", sr=16000)
    with pytest.raises(ValueError):
        butter_sos(4, 100.0, "sideways", sr=16000)


@pytest.mark.parametrize("order,btype,cutoff,tol", [
    (4, "lowpass", 2000.0, 2e-5),
    (8, "highpass", 300.0, 2e-4),      # poles at radius ~0.95
    (6, "bandpass", (300.0, 3000.0), 2e-4),
])
def test_sosfilt_matches_scipy_f64(order, btype, cutoff, tol):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(30000).astype(np.float32)
    sos = butter_sos(order, cutoff, btype, sr=16000)
    y = sosfilt(sos, x)
    ref = ss.sosfilt(sos, x.astype(np.float64))
    assert np.max(np.abs(y - ref)) < tol


def test_sosfilt_streamed_equals_oneshot():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(30000).astype(np.float32)
    sos = butter_sos(8, 300.0, "highpass", sr=16000)
    one = sosfilt(sos, x)
    # chunk boundary NOT at a bucket multiple — exercises the state
    # carry (x tail + scan states), which must be exact, not warm-up
    chunked = sosfilt_streamed(sos, x, chunk=7001)
    np.testing.assert_allclose(chunked, one, atol=2e-5)


def test_sosfilt_zi_holds_steady_state():
    # constant input from the steady state must stay constant
    sos = butter_sos(4, 2000.0, "lowpass", sr=16000)
    c = 0.7
    zi = sosfilt_zi_step(sos, c)
    y = sosfilt(sos, np.full(4096, c, np.float32), zi)
    dc = sos_response(sos, [1e-9], 16000)[0]
    np.testing.assert_allclose(y, c * dc, rtol=0, atol=1e-4)


def test_filtfilt_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(20000).astype(np.float32)
    sos = butter_sos(4, 2000.0, "lowpass", sr=16000)
    mine = filtfilt(sos, x)
    ref = ss.sosfiltfilt(sos, x.astype(np.float64),
                         padlen=3 * (2 * len(sos) + 1))
    assert np.max(np.abs(mine - ref)) < 5e-5


def test_filtfilt_rejects_short_input():
    sos = butter_sos(4, 2000.0, "lowpass", sr=16000)
    with pytest.raises(ValueError):
        filtfilt(sos, np.zeros(10, np.float32))


@pytest.mark.parametrize("numtaps,cutoff,pass_zero", [
    (63, 2000.0, True),
    (64, 2000.0, True),
    (63, (300.0, 3000.0), False),   # bandpass
    (63, (300.0, 3000.0), True),    # bandstop (passes Nyquist)
])
def test_firwin_matches_scipy(numtaps, cutoff, pass_zero):
    h = firwin(numtaps, cutoff, sr=16000, pass_zero=pass_zero)
    ref = ss.firwin(numtaps, cutoff, fs=16000, pass_zero=pass_zero)
    np.testing.assert_allclose(h, ref, atol=1e-12)


def test_firwin_rejects_even_nyquist_and_bad_cutoffs():
    with pytest.raises(ValueError):
        firwin(64, (300.0, 3000.0), sr=16000, pass_zero=True)
    with pytest.raises(ValueError):
        firwin(63, 9000.0, sr=16000)
    with pytest.raises(ValueError):
        firwin(63, (3000.0, 300.0), sr=16000)


def test_fir_filter_is_same_mode_convolution():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(5000).astype(np.float32)
    h = firwin(63, 2000.0, sr=16000)
    y = fir_filter(x, h)
    ref = np.convolve(x.astype(np.float64), h, mode="same")
    assert y.shape == x.shape
    assert np.max(np.abs(y - ref)) < 2e-5


def test_peaking_eq_gain_at_center():
    sos = peaking_eq(16000, 1000.0, 6.0, q=2.0)
    np.testing.assert_allclose(
        sos_response(sos, [1000.0], 16000)[0], 10 ** (6 / 20), rtol=1e-6)
    # unity far away
    assert abs(sos_response(sos, [1.0], 16000)[0] - 1) < 1e-3
    assert abs(sos_response(sos, [7900.0], 16000)[0] - 1) < 1e-3


def test_notch_nulls_center_only():
    sos = notch(16000, 1000.0, q=30.0)
    assert sos_response(sos, [1000.0], 16000)[0] < 1e-6
    assert abs(sos_response(sos, [4000.0], 16000)[0] - 1) < 1e-3


def test_shelves_hit_asymptotes():
    lo = low_shelf(16000, 500.0, 6.0)
    np.testing.assert_allclose(
        sos_response(lo, [0.01], 16000)[0], 10 ** (6 / 20), rtol=1e-4)
    np.testing.assert_allclose(sos_response(lo, [7999.0], 16000)[0],
                               1.0, rtol=1e-3)
    hi = high_shelf(16000, 2000.0, -6.0)
    np.testing.assert_allclose(sos_response(hi, [0.01], 16000)[0],
                               1.0, rtol=1e-4)
    np.testing.assert_allclose(
        sos_response(hi, [7999.0], 16000)[0], 10 ** (-6 / 20), rtol=1e-3)


def test_filter_actually_filters():
    """End to end: a 100 Hz + 4 kHz mixture through a 1 kHz lowpass
    keeps the low tone and kills the high one."""
    sr = 16000
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 100 * t)
         + np.sin(2 * np.pi * 4000 * t)).astype(np.float32)
    y = sosfilt(butter_sos(6, 1000.0, "lowpass", sr=sr), x)
    spec = np.abs(np.fft.rfft(y[2000:]))
    f = np.fft.rfftfreq(len(y) - 2000, 1 / sr)
    lo = spec[np.argmin(np.abs(f - 100))]
    hi = spec[np.argmin(np.abs(f - 4000))]
    assert hi < lo * 1e-4
