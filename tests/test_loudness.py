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


def test_short_term_series_and_oracle(rng):
    """short_term_loudness vs a from-scratch f64 lfilter + sliding
    mean-square oracle, and the spec geometry (10 Hz grid, 3 s span)."""
    from msv_tpu.ops.loudness import short_term_loudness

    sr = 16000
    x = (0.2 * rng.standard_normal(8 * sr)).astype(np.float32)
    got = short_term_loudness(x, sr)
    hop = sr // 10
    n_blocks = 1 + (len(x) - 30 * hop) // hop
    assert got.shape == (n_blocks,)

    (sb, sa), (hb, ha) = k_weighting_coeffs(sr)
    y = lfilter(hb, ha, lfilter(sb, sa, x.astype(np.float64)))
    want = np.array([
        -0.691 + 10 * math.log10(np.mean(y[i * hop:i * hop + 30 * hop] ** 2))
        for i in range(n_blocks)
    ])
    np.testing.assert_allclose(got, want, atol=0.02)


def test_loudness_range_step_and_constant():
    """EBU Tech 3342 sanity: a 12 dB level step reads ~12 LU of range;
    a constant-level tone reads ~0; silence reads exactly 0."""
    from msv_tpu.ops.loudness import loudness_range

    sr = 16000
    t = np.arange(10 * sr) / sr
    x = (0.1 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
    x[5 * sr:] *= 4.0
    lra = loudness_range(x, sr)
    assert abs(lra - 12.0) < 1.0
    assert loudness_range(x[: 5 * sr], sr) < 0.1
    assert loudness_range(np.zeros(5 * sr, np.float32), sr) == 0.0


def test_true_peak_recovers_intersample_peak():
    """A tone at sr/4 with 45-degree phase only ever samples 0.707 of
    its amplitude; the oversampled true peak recovers the full
    amplitude (+3 dB over the sample peak)."""
    from msv_tpu.ops.loudness import true_peak

    sr = 48000
    n = sr // 2
    amp = 0.5
    x = (amp * np.sin(2 * np.pi * (sr / 4) * np.arange(n) / sr
                      + np.pi / 4)).astype(np.float32)
    # fade the edges: a hard onset's band-limited reconstruction
    # legitimately overshoots (Gibbs), which would mask the
    # inter-sample effect this test pins
    ramp = np.linspace(0.0, 1.0, 512, dtype=np.float32)
    x[:512] *= ramp
    x[-512:] *= ramp[::-1]
    sample_peak_db = 20 * math.log10(np.max(np.abs(x)))
    tp = true_peak(x, sr)
    assert abs(tp - 20 * math.log10(amp)) < 0.1
    assert tp > sample_peak_db + 2.8
    # silence and validation
    assert true_peak(np.zeros(4096, np.float32), sr) == float("-inf")
    with pytest.raises(ValueError, match="at least 32"):
        true_peak(np.zeros(8, np.float32), sr)
    # multichannel: the loudest channel defines the peak
    two = np.stack([x, (0.25 * x).astype(np.float32)])
    assert abs(true_peak(two, sr) - tp) < 1e-9


def test_true_peak_streamed_matches_one_shot(monkeypatch, rng):
    """Long-file segmentation: with a tiny forced segment the chunked
    oversample + per-segment parabolic max equals the one-shot path."""
    from msv_tpu.ops import loudness as L

    sr = 16000
    t = np.arange(3 * sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 1234.5 * t)
         + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    want = L.true_peak(x, sr)
    monkeypatch.setattr(L, "_TP_SEG", 8192)
    got = L.true_peak(x, sr)
    assert abs(got - want) < 1e-4


def test_r128_stats_contract():
    """The shared helper: rounded JSON-ready values, None for silence
    (lufs/dbtp) and for sub-3s programs (lra), ValueError below one
    400 ms block — the single gate all three consumers share."""
    from msv_tpu.ops.loudness import r128_stats

    sr = 16000
    t = np.arange(4 * sr) / sr
    x = (0.2 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
    r = r128_stats(x, sr)
    assert set(r) == {"lufs", "lra", "dbtp"}
    assert r["lufs"] is not None and r["dbtp"] is not None
    assert r["lra"] is not None and r["lra"] < 1.0
    assert abs(r["dbtp"] - 20 * math.log10(0.2)) < 0.1
    # 2 s: integrated yes, LRA gated off
    assert r128_stats(x[: 2 * sr], sr)["lra"] is None
    # silence: Nones, not -inf (JSON-safe)
    rs = r128_stats(np.zeros(sr, np.float32), sr)
    assert rs["lufs"] is None and rs["dbtp"] is None and rs["lra"] is None
    with pytest.raises(ValueError):
        r128_stats(x[:100], sr)
