"""Centered STFT framing (reference: ``perform_stft`` lib.rs:388-433 and
``pad`` utils.rs:59-87).

The reference builds frames piecewise (front reflect-pad / zero-copy middle /
back reflect-pad) to avoid copying the middle of the signal on a CPU.  On TPU
the equivalent fusion is different: the *host* materializes one reflect-padded
signal (a memcpy-scale op, trivial next to decode), and the *device* slices
frames out of a (N, hop) reshape — possible because the session guarantees
win_length % hop_length == 0 (config.derive_stft_params).  The two schemes are
sample-exact equivalents; ``reference_framing_oracle`` below reproduces the
Rust piecewise logic for the property tests that prove it.

Frame grid: frame k covers padded[k*hop : k*hop + win] where
padded = reflect_pad(wav, win//2 both sides), so
    n_frames = (L + 2*(win//2) - win) // hop + 1.
"""

import numpy as np


def n_frames_for(n_samples: int, win_length: int, hop_length: int) -> int:
    """Number of centered STFT frames (equivalent to lib.rs:435)."""
    total = n_samples + 2 * (win_length // 2)
    if total < win_length:
        return 0
    return (total - win_length) // hop_length + 1


def reflect_pad_center(wav: np.ndarray, win_length: int) -> np.ndarray:
    """Reflect-pad win//2 samples on both sides (lib.rs:412-433 semantics).

    Requires L >= win//2 + 1 (the reference panics below that; we raise).
    """
    half = win_length // 2
    if wav.shape[-1] < half + 1:
        raise ValueError(
            f"signal too short for win_length={win_length}: "
            f"need at least {half + 1} samples, got {wav.shape[-1]}"
        )
    if half == 0:
        return np.asarray(wav)
    return np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(half, half)], mode="reflect")


def frame_signal_np(padded: np.ndarray, win: int, hop: int, n_frames: int) -> np.ndarray:
    """Host framing of an already-padded signal -> (n_frames, win). Test oracle."""
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    return padded[idx]


def pad_np(array: np.ndarray, n_pad: tuple, axis: int, mode, constant=0):
    """The reference's generic pad (utils.rs:59-87): 'constant' or 'reflect'.

    Reflect uses indices 1..=n_left reversed on the left and
    -(n_right+1)..-1 reversed on the right — identical to np.pad 'reflect'.
    Kept as an explicit op because utils.rs tests pin its exact behavior.
    """
    n_left, n_right = n_pad
    spec = [(0, 0)] * array.ndim
    spec[axis] = (n_left, n_right)
    if mode == "constant":
        return np.pad(array, spec, mode="constant", constant_values=constant)
    elif mode == "reflect":
        return np.pad(array, spec, mode="reflect")
    raise ValueError(f"unknown pad mode {mode!r}")


def reference_framing_oracle(
    wav: np.ndarray, win: int, hop: int, n_fft: int, window: np.ndarray
) -> np.ndarray:
    """Bit-faithful numpy port of the reference's piecewise framing
    (lib.rs:367-435): front/middle/back segments, windowing, and zero-pad to
    n_fft with (floor, ceil) split (lib.rs:400-401).  Returns windowed frames
    of shape (n_frames, n_fft).  Used only by tests to prove the whole-signal
    formulation above is sample-exact equivalent.
    """
    half = win // 2
    n_pad_left = (n_fft - win) // 2
    n_pad_right = int(np.ceil((n_fft - win) / 2.0))

    def to_frames(seg):
        out = []
        for start in range(0, len(seg) - win + 1, hop):
            fr = seg[start : start + win] * window
            out.append(np.pad(fr, (n_pad_left, n_pad_right)))
        return out

    # front: reflect-pad the first win-1 samples by win//2 on the left
    front_wav = pad_np(wav[: win - 1], (half, 0), 0, "reflect")
    front = to_frames(front_wav)

    first_idx = len(front) * hop - half
    middle = to_frames(wav[first_idx:])

    first_idx += len(middle) * hop
    back_start = min(first_idx, len(wav) - half - 1)
    back_wav = pad_np(wav[back_start:], (0, half), 0, "reflect")
    back_wav = back_wav[max(first_idx - back_start, 0) :]
    back = to_frames(back_wav)

    frames = front + middle + back
    return (
        np.stack(frames) if frames else np.zeros((0, n_fft), dtype=wav.dtype)
    )
