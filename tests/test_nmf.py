"""NMF decomposition + separation (ops/nmf.py).

The oracle is the Lee-Seung update rule itself, recomputed with plain
numpy f64 loops; semantic contracts cover monotone KL descent, exact
low-rank recovery, mask-sum reconstruction, and a two-source mixture
actually separating.
"""

import numpy as np
import pytest

from msv_tpu.ops.nmf import kl_divergence, nmf, separate


def _nmf_oracle(v, w, h, n_iter):
    v = v.astype(np.float64)
    w = w.astype(np.float64).copy()
    h = h.astype(np.float64).copy()
    eps = 1e-12
    for _ in range(n_iter):
        r = v / (w @ h + eps)
        h = h * (w.T @ r) / (w.T @ np.ones((v.shape[0], 1)) + eps)
        r = v / (w @ h + eps)
        w = w * (r @ h.T) / (np.ones((v.shape[0], 1))
                             @ (np.ones((1, v.shape[1])) @ h.T) + eps)
    return w, h


def test_matches_update_rule_oracle(rng):
    v = rng.random((40, 60)).astype(np.float32)
    w, h = nmf(v, 4, n_iter=25, seed=7)
    # reproduce the library's own deterministic init
    r2 = np.random.default_rng(7)
    scale = np.sqrt(v.mean() / 4)
    w0 = (scale * (0.1 + r2.random((40, 4)))).astype(np.float32)
    h0 = (scale * (0.1 + r2.random((4, 60)))).astype(np.float32)
    wo, ho = _nmf_oracle(v, w0, h0, 25)
    np.testing.assert_allclose(w, wo, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(h, ho, rtol=2e-3, atol=1e-6)


def test_kl_monotone_descent(rng):
    v = rng.random((64, 80)).astype(np.float32)
    prev = np.inf
    for it in (1, 5, 20, 80):
        w, h = nmf(v, 5, n_iter=it, seed=3)
        d = kl_divergence(v, w, h)
        assert d <= prev + 1e-6, (it, d, prev)
        prev = d


def test_recovers_exact_low_rank(rng):
    w0 = rng.random((32, 2)).astype(np.float32)
    h0 = rng.random((2, 50)).astype(np.float32)
    v = w0 @ h0
    w, h = nmf(v, 2, n_iter=400, seed=1)
    base = kl_divergence(v, v.mean(axis=1, keepdims=True) / v.shape[1],
                         np.ones((1, v.shape[1]), np.float32) * v.sum(0))
    d = kl_divergence(v, w, h)
    rel = d / (np.abs(v).sum())
    assert rel < 1e-4, (d, rel, base)
    np.testing.assert_allclose(w @ h, v, atol=5e-3)


def test_parts_sum_to_input(rng):
    """Wiener masks sum to 1 pointwise, so the K parts reconstruct the
    signal to OLA rounding — same contract as hpss."""
    x = (0.3 * rng.standard_normal(5000)).astype(np.float32)
    parts, w, h = separate(x, 256, 64, 256, n_components=3, n_iter=30)
    assert parts.shape == (3, len(x))
    np.testing.assert_allclose(parts.sum(axis=0), x, atol=2e-4)
    assert w.shape == (129, 3) and h.shape[0] == 3
    assert (w >= 0).all() and (h >= 0).all()


def test_two_source_mixture_separates(rng):
    """A steady low tone + intermittent high noise bursts: NMF with K=2
    should put them in different components (match by correlation;
    >= 10 dB SNR each)."""
    sr = 8000
    n = 4 * sr
    t = np.arange(n) / sr
    tone = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    bursts = np.zeros(n, np.float32)
    rng2 = np.random.default_rng(0)
    for b0 in np.arange(0.3, 3.7, 0.6):
        i = int(b0 * sr)
        seg = rng2.standard_normal(1200).astype(np.float32)
        # highpass the burst well above the tone (diff ~ HF emphasis)
        seg = np.diff(seg, prepend=0.0).astype(np.float32)
        bursts[i:i + 1200] += 0.4 * seg * np.hanning(1200).astype(
            np.float32)
    x = tone + bursts
    parts, _, _ = separate(x, 512, 128, 512, n_components=2, n_iter=150)

    def snr(est, ref):
        return 10 * np.log10(
            (ref ** 2).sum() / max(((est - ref) ** 2).sum(), 1e-12))

    # assign components to sources by correlation
    c_tone = [abs(np.corrcoef(p, tone)[0, 1]) for p in parts]
    k_tone = int(np.argmax(c_tone))
    est_tone, est_burst = parts[k_tone], parts[1 - k_tone]
    assert snr(est_tone, tone) > 10.0, snr(est_tone, tone)
    assert snr(est_burst, bursts) > 8.0, snr(est_burst, bursts)


def test_argument_validation(rng):
    v = rng.random((8, 10)).astype(np.float32)
    with pytest.raises(ValueError):
        nmf(v, 0)
    with pytest.raises(ValueError):
        nmf(v, 9)  # > min(F, T)
    with pytest.raises(ValueError):
        nmf(-v, 2)
    with pytest.raises(ValueError):
        nmf(v, 2, n_iter=0)
    with pytest.raises(ValueError):
        nmf(v[0], 2)
    with pytest.raises(ValueError):
        nmf(np.zeros((0, 5), np.float32), 1)
    x = rng.standard_normal(4000).astype(np.float32)
    with pytest.raises(ValueError):
        separate(x, 256, 64, 256, n_components=0)
    with pytest.raises(ValueError):
        separate(np.zeros(10, np.float32), 1024, 256, 1024)
    with pytest.raises(ValueError):
        separate(x[None], 256, 64, 256)
    with pytest.raises(ValueError):
        separate(x, 256, 64, 256, n_iter=0)
