"""Framing parity: whole-signal formulation vs the reference's piecewise
front/middle/back logic (lib.rs:367-435), property-tested (SURVEY.md §7
hard part "Exact framing at the edges")."""

import numpy as np
import pytest

from msv_tpu.config import derive_stft_params, SpecSetting
from msv_tpu.ops.dft import n_pad_split
from msv_tpu.ops.framing import (
    frame_signal_np,
    n_frames_for,
    pad_np,
    reference_framing_oracle,
    reflect_pad_center,
)
from msv_tpu.ops.windows import default_stft_window


def _our_windowed_frames(wav, win, hop, n_fft, window):
    padded = reflect_pad_center(wav, win)
    n = n_frames_for(len(wav), win, hop)
    frames = frame_signal_np(padded, win, hop, n) * window
    pl, pr = n_pad_split(n_fft, win)
    return np.pad(frames, ((0, 0), (pl, pr)))


def test_pad_constant_and_reflect():
    # utils.rs:126-140 goldens
    a = np.array([[1, 2, 3]])
    np.testing.assert_array_equal(
        pad_np(a, (1, 2), 0, "constant", 10),
        [[10, 10, 10], [1, 2, 3], [10, 10, 10], [10, 10, 10]],
    )
    np.testing.assert_array_equal(
        pad_np(a, (1, 2), 1, "reflect"), [[2, 1, 2, 3, 2, 1]]
    )


@pytest.mark.parametrize(
    "L,win,hop,n_fft",
    [
        (4, 4, 2, 4),  # the reference's golden case
        (100, 16, 4, 16),
        (101, 16, 4, 32),
        (97, 12, 3, 16),
        (320, 320, 80, 512),  # exactly one window length
        (1000, 320, 80, 512),
        (163, 10, 5, 16),
        (163, 10, 2, 16),
        (45, 8, 8, 8),  # hop == win
    ],
)
def test_framing_matches_reference_oracle(L, win, hop, n_fft, rng):
    wav = rng.standard_normal(L).astype(np.float32)
    window = default_stft_window(win, n_fft)
    ours = _our_windowed_frames(wav, win, hop, n_fft, window)
    ref = reference_framing_oracle(wav, win, hop, n_fft, window)
    assert ours.shape == ref.shape, "frame count mismatch"
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_framing_matches_oracle_for_derived_params(rng):
    # All bundled sample rates under default settings (lib.rs:43-46).
    for sr in [8000, 16000, 22050, 24000, 44100, 48000]:
        p = derive_stft_params(sr, SpecSetting())
        L = sr // 3  # ~1/3 second
        wav = rng.standard_normal(L).astype(np.float32)
        window = default_stft_window(p.win_length, p.n_fft)
        ours = _our_windowed_frames(
            wav, p.win_length, p.hop_length, p.n_fft, window
        )
        ref = reference_framing_oracle(
            wav, p.win_length, p.hop_length, p.n_fft, window
        )
        assert ours.shape == ref.shape, (sr, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_derived_params_table():
    # Exact f32 derivation incl. the 22.05k half-away rounding (884/221).
    expect = {
        8000: (320, 80, 512),
        16000: (640, 160, 1024),
        22050: (884, 221, 1024),
        24000: (960, 240, 1024),
        44100: (1764, 441, 2048),
        48000: (1920, 480, 2048),
    }
    for sr, (w, h, n) in expect.items():
        p = derive_stft_params(sr, SpecSetting())
        assert (p.win_length, p.hop_length, p.n_fft) == (w, h, n), sr


def test_too_short_signal_raises():
    with pytest.raises(ValueError):
        reflect_pad_center(np.zeros(3, np.float32), 16)


def test_framing_random_fuzz(rng):
    """Randomized (L, win, hop, n_fft) fuzz vs the piecewise oracle —
    insurance for edge arithmetic (odd windows, hop>win remainders, short
    signals near the reflect-pad minimum)."""
    for _ in range(25):
        win = int(rng.integers(4, 64))
        hop = int(rng.integers(1, win + 4))
        n_fft = int(2 ** np.ceil(np.log2(win)))
        L = int(rng.integers(max(win, win // 2 + 2), 400))
        wav = rng.standard_normal(L).astype(np.float32)
        window = default_stft_window(win, n_fft)
        try:
            ref = reference_framing_oracle(wav, win, hop, n_fft, window)
        except Exception:
            continue  # reference itself would panic on this combo
        ours = _our_windowed_frames(wav, win, hop, n_fft, window)
        assert ours.shape == ref.shape, (L, win, hop)
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=str((L, win, hop)))
