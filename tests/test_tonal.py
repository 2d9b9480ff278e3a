"""Tonal analysis (ops/tonal.py) vs from-scratch oracles + semantics.

librosa is not in this image; the tonnetz oracle builds the interval
circles directly from their semitone step sizes (7/9/4), so agreement
pins the basis construction, not a shared implementation.  Key
estimation is pinned on constructed scales/triads and a synthesized
chord, where the Krumhansl-Schmuckler answer is unambiguous.
"""

import numpy as np
import pytest

from msv_tpu.ops.tonal import (
    KEY_NAMES,
    estimate_key,
    estimate_key_from_chroma,
    oracle_tonnetz_np,
    tonnetz,
    tonnetz_basis,
    tonnetz_from_chroma,
)


# ---------------------------------------------------------------- tonnetz

def test_tonnetz_matches_oracle(rng):
    ch = rng.random((37, 12)).astype(np.float32)
    got = np.asarray(tonnetz_from_chroma(ch, precision="parity"))
    want = oracle_tonnetz_np(ch)
    assert got.shape == (37, 6)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tonnetz_oracle_batch_and_nonstandard_chroma(rng):
    ch = rng.random((3, 11, 24)).astype(np.float32)  # 24-bin chroma
    got = np.asarray(tonnetz_from_chroma(ch, precision="parity"))
    np.testing.assert_allclose(got, oracle_tonnetz_np(ch), atol=1e-5)


def test_tonnetz_onehot_geometry():
    """One-hot chroma lands ON the interval circles at the right radii,
    fifths are neighbors on the fifths circle, tritones antipodal."""
    eye = np.eye(12, dtype=np.float32)
    t = np.asarray(tonnetz_from_chroma(eye, precision="parity"))
    # radii: fifths 1, minor thirds 1, major thirds 0.5
    np.testing.assert_allclose(np.hypot(t[:, 0], t[:, 1]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.hypot(t[:, 2], t[:, 3]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.hypot(t[:, 4], t[:, 5]), 0.5, atol=1e-5)
    d_fifth = np.hypot(*(t[0, :2] - t[7, :2]))    # C vs G
    d_tritone = np.hypot(*(t[0, :2] - t[6, :2]))  # C vs F#
    assert d_fifth < 0.6 < d_tritone
    np.testing.assert_allclose(d_tritone, 2.0, atol=1e-5)  # antipodal
    # major-third circle has 3 distinct points (2*pi/3 per class):
    # classes 3 apart coincide, classes 1 apart do not
    np.testing.assert_allclose(t[0, 4:], t[3, 4:], atol=1e-5)
    assert np.hypot(*(t[0, 4:] - t[1, 4:])) > 0.5


def test_tonnetz_frame_scale_invariance(rng):
    ch = rng.random((20, 12)).astype(np.float32)
    scaled = ch * rng.uniform(0.1, 50.0, (20, 1)).astype(np.float32)
    a = np.asarray(tonnetz_from_chroma(ch, precision="parity"))
    b = np.asarray(tonnetz_from_chroma(scaled, precision="parity"))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_tonnetz_zero_frame_is_origin():
    ch = np.zeros((3, 12), np.float32)
    ch[1, 0] = 1.0
    t = np.asarray(tonnetz_from_chroma(ch, precision="parity"))
    np.testing.assert_allclose(t[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(t[2], 0.0, atol=1e-7)
    assert np.hypot(t[1, 0], t[1, 1]) > 0.99


def test_tonnetz_audio_shapes(rng):
    sr = 16000
    wav = rng.standard_normal((2, sr)).astype(np.float32) * 0.1
    out = np.asarray(tonnetz(wav, sr, precision="parity"))
    assert out.ndim == 3 and out.shape[0] == 2 and out.shape[2] == 6
    solo = np.asarray(tonnetz(wav[0], sr, precision="parity"))
    np.testing.assert_allclose(out[0], solo, atol=1e-5)


def test_tonnetz_validation():
    with pytest.raises(ValueError):
        tonnetz_basis(1)
    with pytest.raises(ValueError):
        tonnetz_from_chroma(np.ones(12, np.float32))
    with pytest.raises(ValueError):
        tonnetz_from_chroma(np.ones((4, 12), np.float32),
                            precision="exact")


# ---------------------------------------------------------------- key

def _chroma_from_weights(weights: dict[int, float]) -> np.ndarray:
    ch = np.zeros(12)
    for k, v in weights.items():
        ch[k % 12] = v
    return ch


def test_key_c_major_scale():
    # C major scale with tonic/dominant emphasis
    ch = _chroma_from_weights(
        {0: 3.0, 2: 1.0, 4: 1.5, 5: 1.0, 7: 2.0, 9: 1.0, 11: 1.0})
    tonic, mode, r, scores = estimate_key_from_chroma(ch)
    assert (tonic, mode) == ("C", "major")
    assert r > 0.7 and scores.shape == (24,)
    assert np.argmax(scores) == 0


def test_key_a_minor_triad_emphasis():
    ch = _chroma_from_weights(
        {9: 3.0, 0: 2.0, 4: 2.0, 2: 1.0, 5: 1.0, 7: 1.0, 11: 1.0})
    tonic, mode, r, _ = estimate_key_from_chroma(ch)
    assert (tonic, mode) == ("A", "minor")


@pytest.mark.parametrize("shift", [0, 3, 7, 10])
def test_key_transposition_covariance(shift):
    base = _chroma_from_weights({0: 3.0, 4: 2.0, 7: 2.5, 2: 0.5, 9: 0.5})
    t0 = estimate_key_from_chroma(base)
    ts = estimate_key_from_chroma(np.roll(base, shift))
    assert t0[0] == "C" and t0[1] == "major"
    assert ts[0] == KEY_NAMES[shift % 12] and ts[1] == "major"


def test_key_minor_triad():
    ch = _chroma_from_weights({0: 3.0, 3: 2.0, 7: 2.5})
    tonic, mode, _, _ = estimate_key_from_chroma(ch)
    assert (tonic, mode) == ("C", "minor")


def test_key_flat_chroma_none():
    tonic, mode, r, scores = estimate_key_from_chroma(np.ones(12))
    assert tonic is None and mode is None and r == 0.0
    assert np.all(scores == 0.0)
    tonic, _, _, _ = estimate_key_from_chroma(np.zeros((5, 12)))
    assert tonic is None


def test_key_time_aggregation(rng):
    frames = np.tile(
        _chroma_from_weights({7: 3.0, 11: 2.0, 2: 2.5}), (40, 1))
    frames += 0.05 * rng.random((40, 12))
    tonic, mode, _, _ = estimate_key_from_chroma(frames)
    assert (tonic, mode) == ("G", "major")


def test_key_from_audio_chord():
    sr = 22050
    t = np.arange(int(1.5 * sr)) / sr
    wav = sum(
        0.3 * np.sin(2 * np.pi * f * t)
        for f in (261.63, 329.63, 392.0, 523.25)  # C4 E4 G4 C5
    ).astype(np.float32)
    tonic, mode, r, _ = estimate_key(wav, sr, precision="parity")
    assert (tonic, mode) == ("C", "major")
    assert r > 0.4


def test_key_validation():
    with pytest.raises(ValueError):
        estimate_key_from_chroma(np.ones(13))
    with pytest.raises(ValueError):
        estimate_key(np.zeros((2, 100), np.float32), 16000)
