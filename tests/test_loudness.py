"""BS.1770-4 loudness (ops/loudness.py).

The filter design is pinned against the standard's published 48 kHz
coefficient table; the scanned-biquad filtering against
scipy.signal.lfilter; the gated measurement against a from-scratch
oracle and the spec's calibration tone.
"""

import math

import numpy as np
import pytest
from scipy.signal import lfilter

from msv_tpu.ops.loudness import (
    _k_weight,
    integrated_loudness,
    k_weighting_coeffs,
)


def test_48k_coefficients_match_bs1770_table():
    """ITU-R BS.1770-4 Tables 1 & 2 (48 kHz pre-filter + RLB)."""
    (sb, sa), (hb, ha) = k_weighting_coeffs(48000)
    np.testing.assert_allclose(
        sb, [1.53512485958697, -2.69169618940638, 1.19839281085285],
        atol=1e-10)
    np.testing.assert_allclose(
        sa, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-10)
    np.testing.assert_allclose(hb, [1.0, -2.0, 1.0], atol=0)
    np.testing.assert_allclose(
        ha, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-5)


@pytest.mark.parametrize("sr", [16000, 44100, 48000])
def test_scanned_biquads_match_scipy_lfilter(sr, rng):
    x = rng.standard_normal(8000).astype(np.float32)
    got = np.asarray(_k_weight(x, sr=sr))
    (sb, sa), (hb, ha) = k_weighting_coeffs(sr)
    want = lfilter(hb, ha, lfilter(sb, sa, x.astype(np.float64)))
    # f32 scans vs the f64 oracle over 8k samples of unit noise: the
    # high-pass poles sit at radius 0.995, so a few 1e-4 of accumulated
    # f32 noise is the expected floor (power-domain effect ~ 1e-7)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_calibration_tone_level():
    """The spec's anchor: a 0 dBFS 997 Hz sine reads -3.01 LUFS (the
    -0.691 offset exists to cancel the K-weighting's gain at 1 kHz),
    and level scales 1:1 in dB."""
    sr = 48000
    t = np.arange(3 * sr) / sr
    x = np.sin(2 * np.pi * 997.0 * t).astype(np.float32)
    l_full = integrated_loudness(x, sr)
    assert abs(l_full - (-10 * math.log10(2.0))) < 0.05
    l_20 = integrated_loudness((0.1 * x).astype(np.float32), sr)
    assert abs((l_full - l_20) - 20.0) < 0.02
    # rumble is attenuated: the 38 Hz 2nd-order high-pass takes
    # ~13 dB off a 20 Hz tone of the same amplitude
    r = np.sin(2 * np.pi * 20.0 * t).astype(np.float32)
    assert integrated_loudness(r, sr) < l_full - 10.0


def test_gating_ignores_long_silence():
    """Integrated loudness of tone+silence stays near the tone's own
    level (the -70/-10 gates drop the silent blocks) rather than
    averaging them in."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    tone = (0.25 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    l_tone = integrated_loudness(tone, sr)
    padded = np.concatenate([tone, np.zeros(8 * sr, np.float32)])
    l_padded = integrated_loudness(padded, sr)
    assert abs(l_padded - l_tone) < 0.5
    # ungated mean square over 10 s vs 2 s would differ by ~7 dB
    assert integrated_loudness(np.zeros(sr, np.float32), sr) == float(
        "-inf")


def test_multichannel_weighting_and_validation(rng):
    sr = 48000
    t = np.arange(sr) / sr
    x = (0.2 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    mono = integrated_loudness(x, sr)
    # two identical channels: +3.01 dB (powers add)
    stereo = integrated_loudness(np.stack([x, x]), sr)
    assert abs((stereo - mono) - 10 * math.log10(2.0)) < 0.02
    with pytest.raises(ValueError, match="channels"):
        integrated_loudness(np.zeros((6, sr), np.float32), sr)
    with pytest.raises(ValueError, match="400 ms"):
        integrated_loudness(x[:1000], sr)
    with pytest.raises(ValueError, match="wav must be"):
        integrated_loudness(np.zeros((1, 2, 3), np.float32), sr)


def test_chunked_filtering_matches_one_scan(monkeypatch, rng):
    """The bounded-memory chunked K-weighting (warm-up overlap
    discarded) equals the single-scan answer to f32 noise, and the
    integrated measurement is unchanged — the hour-scale path."""
    import msv_tpu.ops.loudness as L

    sr = 16000
    x = (0.3 * rng.standard_normal(5 * sr)).astype(np.float32)
    whole = integrated_loudness(x, sr)
    y_whole = np.asarray(L._k_weight(x, sr=sr))
    monkeypatch.setattr(L, "_CHUNK", 16384)
    monkeypatch.setattr(L, "_WARMUP", 8192)
    y_chunks = np.concatenate(list(L._k_weight_chunked(x, sr)))
    assert y_chunks.shape == y_whole.shape
    np.testing.assert_allclose(y_chunks, y_whole, atol=2e-5)
    assert abs(integrated_loudness(x, sr) - whole) < 1e-6
