"""Windowed real DFT as a GEMM (replaces ``src_rust/realfft.rs``).

The reference computes per-frame real FFTs with a half-size complex Radix4
FFT plus a split/twiddle post-pass (realfft.rs:80-157), fanning frames out to
rayon threads (lib.rs:449-458).  That shape is wrong for a TPU: thousands of
short (n_fft <= 4096) independent transforms are exactly one large matmul on
the MXU, which additionally lets us

  * fold the analysis window into the DFT matrix (no separate window mul),
  * skip the zero-padding to n_fft entirely — padding a frame with
    n_pad_left zeros in front only multiplies bin k by a phase
    e^{-2*pi*i*k*n_pad_left/n_fft}, which we bake into the matrix
    (lib.rs:400-401 pads with (floor((n_fft-win)/2), ceil(...))),
  * fuse straight into the downstream mel GEMM / dB / colormap.

So the device computes  re = frames @ C,  im = frames @ S  with
C, S of shape (win_length, n_freq) built here on the host (f64 twiddles,
cast to f32).  FLOPs: 2 * win * n_freq * 2 per frame.
"""

import functools

import numpy as np


def n_pad_split(n_fft: int, win_length: int):
    """(n_pad_left, n_pad_right) of the frame zero-pad (lib.rs:400-401)."""
    n_pad_left = (n_fft - win_length) // 2
    n_pad_right = int(np.ceil((n_fft - win_length) / 2.0))
    return n_pad_left, n_pad_right


@functools.lru_cache(maxsize=64)
def _dft_matrices_cached(win_length: int, n_fft: int, window_key, dtype_str: str):
    window = np.frombuffer(window_key, dtype=np.float32).astype(np.float64)
    n_freq = n_fft // 2 + 1
    n_pad_left, _ = n_pad_split(n_fft, win_length)
    j = np.arange(win_length, dtype=np.float64)[:, None] + n_pad_left
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    phase = -2.0 * np.pi * j * k / n_fft
    c = window[:, None] * np.cos(phase)
    s = window[:, None] * np.sin(phase)
    dt = np.dtype(dtype_str)
    return c.astype(dt), s.astype(dt)


def windowed_dft_matrices(window: np.ndarray, n_fft: int, dtype=np.float32):
    """Real/imag windowed-DFT matrices, each (win_length, n_freq).

    ``frames_raw @ C + 1j * frames_raw @ S`` equals the reference's
    rFFT of (window*frame zero-padded to n_fft)  (realfft.rs:105 output
    convention: unnormalized forward transform, n_freq = n_fft//2+1 bins).
    """
    window = np.ascontiguousarray(window, dtype=np.float32)
    return _dft_matrices_cached(
        len(window), n_fft, window.tobytes(), np.dtype(dtype).str
    )


def rdft_reference_np(frames: np.ndarray) -> np.ndarray:
    """Oracle: numpy rfft of already windowed+padded frames (tests only)."""
    return np.fft.rfft(frames, axis=-1)


@functools.lru_cache(maxsize=32)
def _irdft_matrices_cached(n_fft: int, dtype_str: str):
    n_freq = n_fft // 2 + 1
    j = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    phase = 2.0 * np.pi * j * k / n_fft
    # real-input inverse: x_j = (1/n) * sum_k w_k (re_k cos - im_k sin),
    # with w_k = 2 except DC and (for even n) Nyquist.
    w = np.full(n_freq, 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    dt = np.dtype(dtype_str)
    ci = (np.cos(phase) * w / n_fft).astype(dt)  # (n_fft, n_freq)
    si = (-np.sin(phase) * w / n_fft).astype(dt)
    return ci, si


@functools.lru_cache(maxsize=16)
def end_padded_rdft_matrices(n_rows: int, n_fft: int):
    """Real-DFT matrices for END-zero-padded rows, (n_rows, n_freq) each.

    Correlation-style analyses (YIN difference function, LPC
    autocorrelation) need the signal anchored at index 0, unlike the
    session's centered pad.  Standard rFFT sign convention:
    ``rows @ C + 1j * rows @ S == np.fft.rfft(rows, n_fft)``.
    """
    j = np.arange(n_rows, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j * k / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def inverse_rdft(spec, n_fft: int):
    """Inverse of the real DFT (reference: ``InvRealFFT``, realfft.rs:166-242
    — present in the reference's public surface though unused by its app).

    ``spec``: (..., n_fft//2+1) complex (or a (re, im) tuple).  Returns the
    real signal (..., n_fft), normalized by 1/n_fft (i.e. a true inverse of
    the unnormalized forward transform).  Implemented as two GEMMs so it
    runs on the MXU like the forward path.

    HIGHEST precision, matching every caller's forward GEMMs: on TPU the
    default matmul precision rounds operands through bf16, which is fatal
    where the inverse feeds conditioning-critical math (the LPC normal
    equations NaN'd from a bf16 autocorrelation — measured on v5e) and
    audible where it feeds resynthesis.
    """
    import jax
    import jax.numpy as jnp

    ci, si = _irdft_matrices_cached(n_fft, "<f4")
    if isinstance(spec, tuple):
        re, im = spec
    else:
        re, im = jnp.real(spec), jnp.imag(spec)
    prec = jax.lax.Precision.HIGHEST
    return (jnp.dot(re, jnp.asarray(ci).T, precision=prec)
            + jnp.dot(im, jnp.asarray(si).T, precision=prec))
