"""Cross-track alignment (ops/align.py).

The bundled reference samples — the SAME 44 s clip at five rates
(SURVEY.md §2 "Sample fixtures") — make a natural zero-offset,
cross-rate fixture; synthetic delays pin the sign convention and the
sub-sample refinement.
"""

import numpy as np
import pytest

from msv_tpu.ops.align import align_offset


def _music(rng, n, sr):
    """Aperiodic music-like test signal (a periodic one is ambiguous
    modulo its period — see the module docstring)."""
    env = np.abs(np.convolve(rng.standard_normal(n),
                             np.hanning(sr // 2), "same"))
    env /= max(env.max(), 1e-9)
    x = (env * rng.standard_normal(n) * 0.3).astype(np.float32)
    for p in rng.integers(0, n - 64, 30):
        x[p:p + 64] += np.hanning(64).astype(np.float32)
    return x


@pytest.fixture(scope="module")
def clip():
    rng = np.random.default_rng(7)
    sr = 16000
    return _music(rng, 20 * sr, sr), sr


def test_recovers_known_delay_subsample(clip):
    x, sr = clip
    d = int(1.2345 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:len(x)]
    r = align_offset(x, sr, b, sr, max_lag_s=5.0)
    assert abs(r.offset_s - 1.2345) < 1e-3
    assert abs(r.coarse_s - 1.2345) < 0.05
    assert r.confidence > 0.6


def test_sign_convention_symmetric(clip):
    """Swapping the operands negates the offset (b earlier <=> a later)."""
    x, sr = clip
    d = int(0.8 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:len(x)]
    fwd = align_offset(x, sr, b, sr, max_lag_s=3.0)
    rev = align_offset(b, sr, x, sr, max_lag_s=3.0)
    assert abs(fwd.offset_s - 0.8) < 1e-3
    assert abs(rev.offset_s + 0.8) < 1e-3


def test_cross_rate_alignment(clip):
    """Same material at 8 kHz, delayed: the rate mismatch resamples away."""
    from msv_tpu.ops.resample import resample

    x, sr = clip
    d = int(1.2345 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:len(x)]
    b8 = np.asarray(resample(b, sr, 8000), np.float32)
    r = align_offset(x, sr, b8, 8000, max_lag_s=5.0)
    assert abs(r.offset_s - 1.2345) < 2e-3


def test_robust_to_gain_and_noise(clip):
    x, sr = clip
    rng = np.random.default_rng(8)
    d = int(2.5 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:len(x)]
    b = (0.4 * b + 0.05 * rng.standard_normal(len(b))).astype(np.float32)
    r = align_offset(x, sr, b, sr, max_lag_s=5.0)
    assert abs(r.offset_s - 2.5) < 1e-3


def test_unrelated_material_low_confidence(clip):
    x, sr = clip
    rng = np.random.default_rng(9)
    u = rng.standard_normal(len(x)).astype(np.float32)
    r = align_offset(x, sr, u, sr, max_lag_s=2.0)
    assert r.confidence < 0.3


def test_reference_samples_cross_rate_zero_offset(reference_sample_paths):
    """The bundled samples are one clip at five rates: every pair
    aligns at ~0 with high confidence."""
    from msv_tpu.io.audio import open_audio_mono_ex

    paths = sorted(reference_sample_paths)[:3]  # keep CI time bounded
    ref, ref_sr, _, _, _ = open_audio_mono_ex(paths[0])
    for p in paths[1:]:
        w, sr, _, _, _ = open_audio_mono_ex(p)
        r = align_offset(np.asarray(ref, np.float32),
                         ref_sr, np.asarray(w, np.float32), sr,
                         max_lag_s=5.0)
        assert abs(r.offset_s) < 5e-3, (p, r)
        assert r.confidence > 0.7, (p, r)


def test_validation_errors(clip):
    x, sr = clip
    with pytest.raises(ValueError):
        align_offset(np.array([], np.float32), sr, x, sr)
    with pytest.raises(ValueError):
        align_offset(x, sr, x, sr, max_lag_s=0.0)


def test_refine_false_is_coarse_only(clip):
    x, sr = clip
    d = int(1.0 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:len(x)]
    r = align_offset(x, sr, b, sr, max_lag_s=3.0, refine=False)
    assert abs(r.offset_s - 1.0) < 0.05
    assert r.offset_s == r.coarse_s
