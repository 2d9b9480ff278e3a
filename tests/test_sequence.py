"""Sequence decoding (ops/sequence.py) vs from-scratch DP oracles.

librosa is not in this image; the oracles are direct O(T*S^2) Viterbi
and O(N*M) DTW dynamic programs in numpy, so agreement pins the scan
formulations (max-plus matvec, tropical associative scan), not a shared
implementation.
"""

import numpy as np
import pytest

from msv_tpu.ops.sequence import (
    dtw,
    smooth_f0_viterbi,
    viterbi,
    viterbi_log,
    yin_smoothed,
)


def _oracle_viterbi(log_obs, log_trans, log_init):
    t, s = log_obs.shape
    delta = log_init + log_obs[0]
    back = np.zeros((t, s), np.int64)
    for i in range(1, t):
        m = delta[:, None] + log_trans
        back[i] = np.argmax(m, axis=0)
        delta = m.max(axis=0) + log_obs[i]
    path = np.empty(t, np.int64)
    path[-1] = int(np.argmax(delta))
    for i in range(t - 2, -1, -1):
        path[i] = back[i + 1, path[i + 1]]
    return path, float(delta[path[-1]])


def _oracle_dtw(cost, subsequence=False):
    n, m = cost.shape
    acc = np.full((n, m), np.inf)
    acc[0] = cost[0] if subsequence else np.cumsum(cost[0])
    for i in range(1, n):
        for j in range(m):
            best = acc[i - 1, j]
            if j > 0:
                best = min(best, acc[i - 1, j - 1], acc[i, j - 1])
            acc[i, j] = cost[i, j] + best
    return acc


# ---------------------------------------------------------------- viterbi

@pytest.mark.parametrize("t,s", [(1, 3), (7, 2), (40, 5), (300, 131)])
def test_viterbi_matches_oracle(rng, t, s):
    log_obs = rng.standard_normal((t, s)).astype(np.float32) * 2.0
    a = rng.random((s, s)) + 0.05
    a /= a.sum(axis=1, keepdims=True)
    log_trans = np.log(a).astype(np.float32)
    log_init = np.log(np.full(s, 1.0 / s, np.float32))
    path, logp = viterbi_log(log_obs, log_trans, log_init)
    want_path, want_logp = _oracle_viterbi(
        log_obs.astype(np.float64), log_trans.astype(np.float64),
        log_init.astype(np.float64))
    np.testing.assert_array_equal(path, want_path)
    np.testing.assert_allclose(logp, want_logp, rtol=1e-4, atol=1e-3)


def test_viterbi_sticky_hmm_denoises(rng):
    """A sticky 2-state HMM: isolated observation flips do not flip the
    decoded state."""
    true = np.repeat([0, 1, 0], [30, 40, 30])
    p_correct = np.full(len(true), 0.9)
    # genuinely ISOLATED flips: away from the state boundaries and from
    # each other — two adjacent flips AT a boundary make the MAP path
    # legitimately move the decoded transition (found by fresh-seed
    # sweep), which is correct decoding, not a failure to denoise
    cand = [i for i in range(len(true))
            if min(abs(i - 30), abs(i - 70)) > 2]
    flip = []
    for i in rng.permutation(cand):
        if all(abs(int(i) - j) > 1 for j in flip):
            flip.append(int(i))
        if len(flip) == 8:
            break
    p_correct[flip] = 0.2  # noisy frames vote for the wrong state
    prob = np.stack([np.where(true == 0, p_correct, 1 - p_correct),
                     np.where(true == 1, p_correct, 1 - p_correct)],
                    axis=1)
    trans = np.array([[0.99, 0.01], [0.01, 0.99]])
    path, _ = viterbi(prob, trans)
    np.testing.assert_array_equal(path, true)


def test_viterbi_validation():
    with pytest.raises(ValueError):
        viterbi_log(np.zeros((0, 3), np.float32), np.zeros((3, 3)))
    with pytest.raises(ValueError):
        viterbi_log(np.zeros((5, 3), np.float32), np.zeros((2, 2)))
    with pytest.raises(ValueError):
        viterbi_log(np.zeros((5, 3), np.float32), np.zeros((3, 3)),
                    np.zeros(2))
    with pytest.raises(ValueError, match="prob"):
        viterbi(np.full((4, 2), 1.5), np.eye(2))
    with pytest.raises(ValueError, match="transition"):
        viterbi(np.full((4, 2), 0.5), np.full((2, 2), 0.9))


# ---------------------------------------------------------------- dtw

@pytest.mark.parametrize("n,m", [(1, 1), (5, 9), (64, 40), (130, 260)])
def test_dtw_matches_oracle(rng, n, m):
    cost = rng.random((n, m)).astype(np.float32)
    acc, path, total = dtw(cost=cost)
    want = _oracle_dtw(cost.astype(np.float64))
    np.testing.assert_allclose(acc, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(total, want[-1, -1], rtol=1e-5)
    # path validity: endpoints, monotone unit steps, cost consistency
    assert tuple(path[0]) == (0, 0) and tuple(path[-1]) == (n - 1, m - 1)
    steps = np.diff(path, axis=0)
    assert np.all((steps >= 0) & (steps <= 1)) and np.all(
        steps.sum(axis=1) >= 1)
    path_cost = cost[path[:, 0], path[:, 1]].sum()
    np.testing.assert_allclose(path_cost, total, rtol=1e-4)


def test_dtw_identity_is_diagonal(rng):
    x = rng.standard_normal((50, 4)).astype(np.float32)
    acc, path, total = dtw(x, x)
    np.testing.assert_allclose(total, 0.0, atol=1e-4)
    np.testing.assert_array_equal(path[:, 0], path[:, 1])


def test_dtw_warped_tone_alignment():
    """Aligning a ramp with its 2x time-stretched copy stays within one
    step of the ideal 2:1 line."""
    a = np.linspace(0, 1, 40, dtype=np.float32)
    b = np.linspace(0, 1, 80, dtype=np.float32)
    _, path, _ = dtw(a, b)
    ideal = path[:, 0] * 2.0
    assert np.abs(path[:, 1] - ideal).max() <= 2.0


def test_dtw_subsequence_finds_offset(rng):
    x = rng.standard_normal((30, 3)).astype(np.float32)
    pad = rng.standard_normal((25, 3)).astype(np.float32) + 5.0
    y = np.concatenate([pad, x, pad + 2.0])
    acc, path, total = dtw(x, y, subsequence=True)
    assert total < 1e-3  # exact copy embedded
    assert path[0][0] == 0 and path[0][1] == 25
    assert tuple(path[-1]) == (29, 54)
    # oracle agreement for the accumulated matrix too
    from msv_tpu.ops.sequence import _pairwise_cost

    want = _oracle_dtw(
        _pairwise_cost(x, y, "euclidean").astype(np.float64),
        subsequence=True)
    np.testing.assert_allclose(acc, want, rtol=1e-4, atol=1e-4)


def test_dtw_cosine_metric(rng):
    x = rng.standard_normal((10, 8)).astype(np.float32)
    acc, path, total = dtw(x, x, metric="cosine")
    np.testing.assert_allclose(total, 0.0, atol=1e-5)


def test_dtw_validation(rng):
    with pytest.raises(ValueError):
        dtw()
    with pytest.raises(ValueError):
        dtw(np.ones((3, 2)), np.ones((3, 3)))
    with pytest.raises(ValueError):
        dtw(np.ones((3, 2)), np.ones((3, 2)), cost=np.ones((3, 3)))
    with pytest.raises(ValueError, match="metric"):
        dtw(np.ones((3, 2)), np.ones((3, 2)), metric="manhattan")
    with pytest.raises(ValueError):
        dtw(cost=np.ones((0, 4)))


# ---------------------------------------------------------------- pitch

def test_smooth_f0_heals_octave_glitch():
    """A steady 220 Hz contour with isolated octave-error frames decodes
    back to 220 Hz everywhere."""
    t = 60
    f0 = np.full(t, 220.0, np.float32)
    f0[[10, 11, 37]] = 440.0  # octave errors
    f0[45] = 110.0
    ap = np.full(t, 0.05, np.float32)
    out, voiced = smooth_f0_viterbi(f0, ap)
    assert voiced.all()
    cents_err = 1200 * np.abs(np.log2(out / 220.0))
    assert cents_err.max() < 30.0  # within one 25-cent grid step


def test_smooth_f0_unvoices_noise():
    t = 80
    f0 = np.full(t, 220.0, np.float32)
    ap = np.full(t, 0.05, np.float32)
    ap[30:50] = 0.9  # aperiodic stretch
    out, voiced = smooth_f0_viterbi(f0, ap)
    # the sticky 2-state decode is decisive here (13.8-nat obs margin
    # vs 4.6-nat switch): boundaries land exactly
    assert voiced[:30].all() and voiced[50:].all()
    assert not voiced[30:50].any()
    assert np.all(out[~voiced] == 0.0)
    # the pitch contour holds 220 Hz THROUGH the unvoiced stretch
    # (tempered observations), so re-entry is seamless
    np.testing.assert_allclose(out[50:], out[0], atol=1e-5)


def test_smooth_f0_tracks_vibrato():
    """Smoothing must not flatten real (slow) pitch movement."""
    t = np.arange(200)
    f0 = (220.0 * 2.0 ** (0.5 * np.sin(2 * np.pi * t / 50.0) / 12.0)
          ).astype(np.float32)  # +-50 cent vibrato
    ap = np.full(len(t), 0.05, np.float32)
    out, voiced = smooth_f0_viterbi(f0, ap)
    assert voiced.all()
    cents_err = 1200 * np.abs(np.log2(out / f0))
    assert np.mean(cents_err) < 20.0
    # the decoded contour really moves
    assert 1200 * np.log2(out.max() / out.min()) > 60.0


def test_yin_smoothed_end_to_end():
    sr = 16000
    tt = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * tt)).astype(np.float32)
    wav[: sr // 8] = 0.0  # leading silence
    f0, voiced = yin_smoothed(wav, sr, fmin=80.0, fmax=1000.0)
    mid = voiced & (np.arange(len(f0)) > len(f0) // 4)
    assert mid.sum() > len(f0) // 3
    np.testing.assert_allclose(f0[mid], 220.0, rtol=0.02)


def test_smooth_f0_validation():
    with pytest.raises(ValueError):
        smooth_f0_viterbi(np.ones(5), np.ones(4))
    with pytest.raises(ValueError):
        smooth_f0_viterbi(np.ones(5), np.ones(5), fmin=500, fmax=100)
    with pytest.raises(ValueError):
        smooth_f0_viterbi(np.ones(5), np.ones(5), bins_per_semitone=0)
    out, voiced = smooth_f0_viterbi(np.zeros(0), np.zeros(0))
    assert out.shape == (0,) and voiced.shape == (0,)
