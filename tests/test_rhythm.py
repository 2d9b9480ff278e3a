"""Rhythm analysis (ops/rhythm.py) vs from-scratch oracles + semantics.

librosa is not in this image; the tempogram oracle is a direct O(W^2)
windowed linear ACF per frame (numpy), so agreement pins the
Wiener-Khinchin GEMM formulation, not a shared implementation.  Beat
tracking is pinned semantically: click trains at a known BPM must
localize, steady envelopes and silence must not.
"""

import numpy as np
import pytest

from msv_tpu.features import onset_strength
from msv_tpu.ops.rhythm import (
    beat_track_from_envelope,
    oracle_tempogram_np,
    tempo_from_tempogram,
    tempogram_from_envelope,
)


def _click_env(n, period, amp=1.0, noise=0.0, rng=None):
    env = np.zeros(n, np.float32)
    env[::period] = amp
    if noise and rng is not None:
        env += noise * np.abs(rng.standard_normal(n)).astype(np.float32)
    return env


# ---------------------------------------------------------------- tempogram

@pytest.mark.parametrize("win,hop", [(64, 1), (64, 3), (96, 7)])
def test_tempogram_matches_oracle(rng, win, hop):
    env = np.abs(rng.standard_normal(300)).astype(np.float32)
    env[::23] += 4.0
    got = np.asarray(tempogram_from_envelope(env, 100.0, win_length=win,
                                             hop=hop))
    want = oracle_tempogram_np(env, win, hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_tempogram_lag0_and_range(rng):
    env = np.abs(rng.standard_normal(500)).astype(np.float32)
    tg = np.asarray(tempogram_from_envelope(env, 100.0, win_length=128))
    # centered frames: center t*hop for t in [0, T] inclusive -> T+1 rows
    assert tg.shape == (501, 128)
    # interior frames see nonzero signal: lag 0 is a correlation coeff of 1
    np.testing.assert_allclose(tg[64:-64, 0], 1.0, atol=1e-4)
    assert np.all(tg <= 1.0 + 1e-4)


def test_tempogram_validation():
    with pytest.raises(ValueError):
        tempogram_from_envelope(np.ones(10, np.float32), 100.0, win_length=2)
    with pytest.raises(ValueError):
        tempogram_from_envelope(np.ones(10, np.float32), 100.0, hop=0)
    with pytest.raises(ValueError):
        tempogram_from_envelope(np.ones((4, 4), np.float32), 100.0)
    with pytest.raises(ValueError):
        tempogram_from_envelope(np.empty(0, np.float32), 100.0)


def test_tempogram_periodicity_peaks(rng):
    """A 120 BPM click train at fps=100 (period 50) puts ACF peaks at
    lags 50 and 100 that dominate their neighborhoods."""
    env = _click_env(1000, 50, noise=0.02, rng=rng)
    tg = np.asarray(tempogram_from_envelope(env, 100.0, win_length=256))
    ac = tg.mean(axis=0)
    assert ac[50] > ac[30] and ac[50] > ac[70]
    assert ac[100] > ac[80] and ac[100] > ac[120]


# --------------------------------------------------------------------- tempo

@pytest.mark.parametrize("period,bpm", [(50, 120.0), (60, 100.0),
                                        (40, 150.0)])
def test_tempo_recovers_click_train(rng, period, bpm):
    env = _click_env(2000, period, noise=0.02, rng=rng)
    tg = tempogram_from_envelope(env, 100.0)
    got = tempo_from_tempogram(np.asarray(tg), 100.0)
    assert got == pytest.approx(bpm, rel=0.03)


def test_tempo_prior_arbitrates_octave():
    """Clicks at 60 BPM (period 100): lags 100/200 offer 60 and 30 BPM;
    the 120-centered prior must pick 60, not the subharmonic."""
    env = _click_env(3000, 100)
    tg = np.asarray(tempogram_from_envelope(env, 100.0))
    assert tempo_from_tempogram(tg, 100.0) == pytest.approx(60.0, rel=0.03)


def test_tempo_no_valid_lag_returns_zero():
    tg = np.ones((4, 4), np.float32)
    # fps=1: lags 1..3 -> 60/30/20 BPM, none in [300, 320]
    assert tempo_from_tempogram(tg, 1.0, min_bpm=300.0, max_bpm=320.0) == 0.0


def test_tempo_validation():
    tg = np.ones((4, 16), np.float32)
    with pytest.raises(ValueError):
        tempo_from_tempogram(tg, 100.0, min_bpm=200.0, max_bpm=100.0)


# --------------------------------------------------------------------- beats

def test_beat_track_click_train(rng):
    period = 50                       # 120 BPM at fps=100
    env = _click_env(2000, period, noise=0.02, rng=rng)
    bpm, beats = beat_track_from_envelope(env, 100.0)
    assert bpm == pytest.approx(120.0, rel=0.03)
    assert len(beats) >= 35           # ~40 clicks in 20 s
    # every beat lands within 2 frames of a click
    off = np.abs(beats[:, None] - np.arange(0, 2000, period)[None, :])
    assert off.min(axis=1).max() <= 2
    gaps = np.diff(beats)
    assert np.all(np.abs(gaps - period) <= 3)


def test_beat_track_explicit_bpm(rng):
    env = _click_env(1500, 60, noise=0.01, rng=rng)  # 100 BPM
    bpm, beats = beat_track_from_envelope(env, 100.0, bpm=100.0)
    assert bpm == 100.0
    gaps = np.diff(beats)
    assert np.all(np.abs(gaps - 60) <= 3)


def test_beat_track_silence_and_empty():
    bpm, beats = beat_track_from_envelope(np.zeros(500, np.float32), 100.0)
    assert beats.size == 0
    bpm, beats = beat_track_from_envelope(np.empty(0, np.float32), 100.0)
    assert beats.size == 0


def test_beat_track_ascending_int():
    env = _click_env(800, 40)
    _, beats = beat_track_from_envelope(env, 100.0)
    assert beats.dtype == np.int64
    assert np.all(np.diff(beats) > 0)


# -------------------------------------------------------- audio integration

def test_audio_click_train_end_to_end():
    """8 kHz click train at 120 BPM -> onset envelope -> recovered tempo
    + beats within one envelope hop of the click times."""
    sr = 8000
    dur, bps = 10.0, 2.0              # 120 BPM = 2 beats/s
    n = int(dur * sr)
    x = 0.003 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)
    click_t = np.arange(0.25, dur - 0.5, 1.0 / bps)
    for t0 in click_t:
        i = int(t0 * sr)
        x[i:i + 64] += 0.8 * np.hanning(64)
    env = np.asarray(onset_strength(x.astype(np.float32), sr))
    fps = 100.0                       # hop_ms=10 default
    bpm, beats = beat_track_from_envelope(env, fps)
    assert bpm == pytest.approx(120.0, rel=0.05)
    beat_s = beats / fps
    # each detected beat within 30 ms of some click
    off = np.abs(beat_s[:, None] - click_t[None, :]).min(axis=1)
    assert np.median(off) <= 0.03
    # the audio-level wrapper reproduces the same result in seconds
    from msv_tpu.ops.rhythm import beat_track

    bpm2, beats_s = beat_track(x.astype(np.float32), sr)
    assert bpm2 == bpm
    np.testing.assert_allclose(beats_s, beat_s)


def test_beat_track_rejects_batch(rng):
    from msv_tpu.ops.rhythm import beat_track

    with pytest.raises(ValueError):
        beat_track(rng.standard_normal((2, 8000)).astype(np.float32), 8000)
