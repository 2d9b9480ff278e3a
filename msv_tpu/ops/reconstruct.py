"""Spectrogram -> audio reconstruction: Griffin-Lim phase recovery and
mel-filterbank inversion.

The reference ships an inverse real FFT (``InvRealFFT``,
realfft.rs:166-242) but never wires it to anything — there is no
synthesis path at all.  This module closes the loop the TPU way: the
whole Griffin-Lim iteration (istft -> stft -> phase projection) runs as
GEMMs + overlap-add inside ONE jitted ``lax.fori_loop`` on device, so
reconstruction is MXU work with no per-iteration host round-trips.

Conventions match :func:`msv_tpu.ops.stft.perform_stft` /
:func:`inverse_stft`: centered frames, reflect padding, any analysis
window (defaults to the session's hann/n_fft, lib.rs:407); magnitudes
produced by the session/export pipeline invert directly.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dft import inverse_rdft, n_pad_split, windowed_dft_matrices
from .stft import frame_device
from .windows import default_stft_window


def _ola_constants(n_frames: int, win: int, hop: int, window: np.ndarray):
    """Host-built overlap-add scatter index + COLA normalizer."""
    total = (n_frames - 1) * hop + win
    idx = (
        np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    ).ravel()
    wsq = np.zeros(total, np.float32)
    np.add.at(wsq, idx, np.tile((window * window).astype(np.float32),
                                n_frames))
    return idx.astype(np.int32), np.maximum(wsq, np.float32(1e-24)), total


@functools.partial(
    jax.jit,
    static_argnames=("win", "hop", "n_fft", "n_frames", "n_iter",
                     "momentum"),
)
def _griffin_lim_core(mag, c, s, syn, idx, wsq, *, win, hop, n_fft,
                      n_frames, n_iter, momentum):
    """The whole iteration lives on the PADDED timeline: istft produces
    the full (n_frames-1)*hop + win OLA signal and stft re-frames it
    directly — a textbook adjoint-consistent (istft, stft) projection
    pair with NO per-iteration slice/re-pad.  That keeps the program's
    shape keyed on the frame BUCKET alone (n_frames padded to 128
    upstream; zero-magnitude pad rows are inert: their OLA contribution
    is zero and ``wsq`` is built from the true frames only), so the jit
    cache stays bounded per the repo convention, and works for any
    win/hop parity (the old in-loop reflect re-pad was one sample short
    for odd win)."""
    pl, _ = n_pad_split(n_fft, win)
    total = (n_frames - 1) * hop + win
    mfac = jnp.float32(momentum / (1.0 + momentum))

    def istft(re, im):
        frames = inverse_rdft((re, im), n_fft)[:, pl:pl + win] * syn[None, :]
        sig = jnp.zeros(total, jnp.float32).at[idx].add(frames.ravel())
        return sig / wsq

    def stft(x):
        frames = frame_device(x, win, hop, n_frames)
        return frames @ c, frames @ s

    def body(_, carry):
        ang_re, ang_im, reb_re, reb_im = carry
        inv = istft(mag * ang_re, mag * ang_im)
        nre, nim = stft(inv)
        are = nre - mfac * reb_re
        aim = nim - mfac * reb_im
        norm = jnp.sqrt(are * are + aim * aim) + jnp.float32(1e-16)
        return are / norm, aim / norm, nre, nim

    ones = jnp.ones_like(mag)
    zeros = jnp.zeros_like(mag)
    ang_re, ang_im, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (ones, zeros, zeros, zeros)
    )
    return istft(mag * ang_re, mag * ang_im)


def griffin_lim(
    mag,
    win_length: int,
    hop_length: int,
    n_fft: int,
    *,
    n_iter: int = 32,
    momentum: float = 0.99,
    window=None,
    length: int | None = None,
):
    """Reconstruct audio from an STFT magnitude by Griffin-Lim.

    ``mag``: (n_frames, n_fft//2+1) linear magnitude in the
    :func:`perform_stft` convention (``window`` defaults to the
    session's hann/n_fft; pass the unscaled analysis window for
    feature-frontend magnitudes).  Returns a float32 signal of
    ``length`` samples (default ``(n_frames-1)*hop_length``, the
    centered-STFT inverse length).

    The accelerated (momentum) variant: each iteration projects onto the
    consistent-spectrogram set via istft->stft and renormalizes phase,
    with the classic 1983 method at ``momentum=0``.  The full loop is
    one compiled program; all transforms are GEMMs on the MXU.
    """
    mag = jnp.asarray(mag, jnp.float32)
    if mag.ndim != 2 or mag.shape[1] != n_fft // 2 + 1:
        raise ValueError(
            f"mag must be (n_frames, {n_fft // 2 + 1}), got {mag.shape}"
        )
    if not (0.0 <= momentum < 1.0):
        raise ValueError(f"momentum must be in [0, 1), got {momentum}")
    n_frames = mag.shape[0]
    if length is None:
        length = (n_frames - 1) * hop_length
    half = win_length // 2
    if length < half + 1:
        raise ValueError(
            f"too few frames to reconstruct: length {length} < "
            f"win_length//2+1 = {half + 1} (need more frames or an "
            "explicit length)"
        )
    if window is None:
        window = default_stft_window(win_length, n_fft)
    window = np.ascontiguousarray(window, dtype=np.float32)
    c, s = windowed_dft_matrices(window, n_fft)
    # frame-bucketed program (repo convention: bounded jit cache): pad
    # rows are zero-magnitude — inert through the OLA — and the
    # normalizer is built from the TRUE frames only so the real tail is
    # not attenuated by phantom window mass
    from ..utils import round_up_to

    n_pad = round_up_to(n_frames, 128)
    idx, _, total_pad = _ola_constants(n_pad, win_length, hop_length,
                                       window)
    _, wsq, total_true = _ola_constants(n_frames, win_length, hop_length,
                                        window)
    wsq = np.pad(wsq, (0, total_pad - total_true),
                 constant_values=np.float32(1e-24))
    mag = jnp.pad(mag, ((0, n_pad - n_frames), (0, 0)))
    half = win_length // 2
    out = _griffin_lim_core(
        mag, jnp.asarray(c), jnp.asarray(s), jnp.asarray(window),
        jnp.asarray(idx), jnp.asarray(wsq),
        win=win_length, hop=hop_length, n_fft=n_fft, n_frames=n_pad,
        n_iter=int(n_iter), momentum=float(momentum),
    )
    # fetch-then-slice: audio output is host-bound anyway, and a device
    # slice would mint a (tiny) program per distinct length
    return np.asarray(out)[half:half + int(length)]


@functools.lru_cache(maxsize=16)
def _mel_pinv_cached(fb_key: bytes, shape: tuple) -> np.ndarray:
    fb = np.frombuffer(fb_key, dtype=np.float32).reshape(shape)
    return np.linalg.pinv(fb.astype(np.float64)).astype(np.float32)


def mel_to_linear(mel, fb):
    """Least-squares inversion of the mel projection: given
    ``mel = linspec @ fb`` (fb: (n_freq, n_mel), the calc_mel_fb layout),
    return the minimum-norm non-negative estimate ``clip(mel @ pinv(fb),
    0)``.  The pseudo-inverse is built host-side in f64 (cached per fb)
    and applied as one GEMM; feed the result to :func:`griffin_lim` to
    turn mel dB exports back into audio."""
    fb = np.ascontiguousarray(fb, dtype=np.float32)
    if fb.ndim != 2:
        raise ValueError(f"fb must be (n_freq, n_mel), got {fb.shape}")
    mel = jnp.asarray(mel, jnp.float32)
    if mel.shape[-1] != fb.shape[1]:
        raise ValueError(
            f"mel last dim {mel.shape[-1]} != fb n_mel {fb.shape[1]}"
        )
    pinv = _mel_pinv_cached(fb.tobytes(), fb.shape)
    return jnp.maximum(
        jnp.dot(mel, jnp.asarray(pinv),
                preferred_element_type=jnp.float32), 0.0
    )
