"""Structure segmentation (ops/segment.py) vs from-scratch oracles.

librosa is not in this image; the novelty oracle is a direct O(T*L^2)
sliding quadratic form, so agreement pins the banded-Toeplitz GEMM
formulation, not a shared implementation.  Boundaries are pinned
semantically: block-structured audio must split at the block edges,
homogeneous audio must not split.
"""

import numpy as np
import pytest

from msv_tpu.ops.segment import (
    MAX_SSM_FRAMES,
    novelty_from_ssm,
    oracle_novelty_np,
    segment,
    segment_boundaries,
    self_similarity,
)


# ---------------------------------------------------------------- ssm

def test_ssm_cosine_properties(rng):
    f = rng.standard_normal((50, 8)).astype(np.float32)
    s = np.asarray(self_similarity(f, precision="parity"))
    assert s.shape == (50, 50)
    np.testing.assert_allclose(np.diag(s), 1.0, atol=1e-5)
    np.testing.assert_allclose(s, s.T, atol=1e-5)
    assert s.max() <= 1.0 + 1e-5 and s.min() >= -1.0 - 1e-5
    # direct cosine check on a sampled pair
    want = f[3] @ f[17] / (np.linalg.norm(f[3]) * np.linalg.norm(f[17]))
    np.testing.assert_allclose(s[3, 17], want, atol=1e-5)


def test_ssm_zero_frame_and_validation(rng):
    f = np.zeros((10, 4), np.float32)
    f[5] = 1.0
    s = np.asarray(self_similarity(f, precision="parity"))
    np.testing.assert_allclose(s[0, 1], 0.0, atol=1e-6)
    with pytest.raises(ValueError):
        self_similarity(np.zeros(5, np.float32))
    with pytest.raises(ValueError, match="MAX_SSM_FRAMES"):
        self_similarity(
            np.zeros((MAX_SSM_FRAMES + 1, 2), np.float32))


# ---------------------------------------------------------------- novelty

@pytest.mark.parametrize("t,ks", [(40, 4), (130, 16), (257, 8)])
def test_novelty_matches_oracle(rng, t, ks):
    f = rng.standard_normal((t, 6)).astype(np.float32)
    f[t // 2:] += 3.0  # one structural change
    ssm = np.asarray(self_similarity(f, precision="parity"))
    got = novelty_from_ssm(ssm, kernel_size=ks, precision="parity")
    want = oracle_novelty_np(ssm, ks)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_novelty_peaks_at_block_edge(rng):
    """Two homogeneous feature blocks: novelty peaks at the junction."""
    a = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    f = np.stack([a + 0.05 * rng.standard_normal(8).astype(np.float32)
                  for _ in range(60)]
                 + [b + 0.05 * rng.standard_normal(8).astype(np.float32)
                    for _ in range(60)])
    ssm = self_similarity(f, precision="parity")
    nov = novelty_from_ssm(ssm, kernel_size=12, precision="parity")
    assert abs(int(np.argmax(nov)) - 60) <= 2
    # interior of a homogeneous block: near-zero novelty
    assert nov[30] < 0.1 * nov.max()


def test_novelty_short_input_and_validation():
    assert novelty_from_ssm(np.eye(5, dtype=np.float32),
                            kernel_size=4).tolist() == [0.0] * 5
    with pytest.raises(ValueError):
        novelty_from_ssm(np.zeros((4, 5), np.float32))
    with pytest.raises(ValueError):
        novelty_from_ssm(np.eye(40, dtype=np.float32), kernel_size=1)


# ---------------------------------------------------------------- bounds

def test_segment_boundaries_blocks(rng):
    blocks = [rng.standard_normal(10).astype(np.float32) for _ in range(3)]
    f = np.concatenate([
        np.stack([blk + 0.03 * rng.standard_normal(10).astype(np.float32)
                  for _ in range(50)])
        for blk in blocks])
    idx = segment_boundaries(f, kernel_size=10)
    # two true boundaries at 50 and 100
    assert len(idx) == 2
    assert abs(idx[0] - 50) <= 3 and abs(idx[1] - 100) <= 3


def test_segment_boundaries_homogeneous(rng):
    base = rng.standard_normal(10).astype(np.float32)
    f = np.stack([base + 0.03 * rng.standard_normal(10).astype(np.float32)
                  for _ in range(120)])
    idx = segment_boundaries(f, kernel_size=10, delta=0.5)
    assert len(idx) == 0


# ---------------------------------------------------------------- audio

def test_segment_audio_two_sections(rng):
    """A tone section followed by a noise section splits at the joint."""
    sr = 8000
    t = np.arange(4 * sr) / sr
    tone = 0.4 * np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noise = 0.2 * rng.standard_normal(4 * sr).astype(np.float32)
    wav = np.concatenate([tone, noise])
    bounds = segment(wav, sr, hop_s=0.1, kernel_s=1.0,
                     precision="parity")
    assert len(bounds) >= 1
    assert min(abs(b - 4.0) for b in bounds) < 0.5


def test_segment_validation():
    with pytest.raises(ValueError):
        segment(np.zeros((2, 100), np.float32), 8000)
    with pytest.raises(ValueError):
        segment(np.zeros(100, np.float32), 8000, hop_s=1.0, kernel_s=0.5)
