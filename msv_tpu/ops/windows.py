"""Window functions (reference: ``src_rust/windows.rs``).

Host-side constant builders — windows are tiny per-sample-rate constants,
cached by the session and folded into the DFT matrix on device, so there is
no reason to generate them on the TPU.

Semantics match ``cosine_window`` (windows.rs:7-19): generalized 4-term
cosine window; *periodic* form (symmetric=False) computes size+1 points and
keeps the first ``size``.  Only Hann is exposed by the reference
(windows.rs:21-30): a=b=0.5, c=d=0.
"""

import numpy as np


def cosine_window(
    a: float, b: float, c: float, d: float, size: int, symmetric: bool, dtype=np.float32
) -> np.ndarray:
    if size <= 1:
        raise ValueError("window size must be > 1 (windows.rs:8 assert)")
    size2 = size if symmetric else size + 1
    dt = np.dtype(dtype).type
    i = np.arange(size2, dtype=dtype)
    x = dt(np.pi) * i / dt(size2 - 1)
    w = (
        dt(a)
        - dt(b) * np.cos(dt(2.0) * x)
        + dt(c) * np.cos(dt(4.0) * x)
        - dt(d) * np.cos(dt(6.0) * x)
    )
    return w[:size].astype(dtype)


def hann(size: int, symmetric: bool = False, dtype=np.float32) -> np.ndarray:
    """Periodic (default) or symmetric Hann window (windows.rs:21-30)."""
    return cosine_window(0.5, 0.5, 0.0, 0.0, size, symmetric, dtype)


def hamming(size: int, symmetric: bool = False, dtype=np.float32) -> np.ndarray:
    """Hamming window via the generalized form (the reference's
    cosine_window supports it, windows.rs:7; only hann is exposed there)."""
    return cosine_window(0.54, 0.46, 0.0, 0.0, size, symmetric, dtype)


def blackman(size: int, symmetric: bool = False, dtype=np.float32) -> np.ndarray:
    """Blackman window (a=0.42, b=0.5, c=0.08)."""
    return cosine_window(0.42, 0.5, 0.08, 0.0, size, symmetric, dtype)


def blackman_harris(size: int, symmetric: bool = False, dtype=np.float32) -> np.ndarray:
    """4-term Blackman-Harris window."""
    return cosine_window(
        0.35875, 0.48829, 0.14128, 0.01168, size, symmetric, dtype
    )


def default_stft_window(win_length: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """The window the session uses: periodic hann scaled by 1/n_fft.

    The 1/n_fft normalization is baked into the window vector
    (lib.rs:138-140, lib.rs:407) — this changes every dB value, so it is
    part of the numerical contract.
    """
    return (hann(win_length, False, dtype) / np.dtype(dtype).type(n_fft)).astype(dtype)
