"""Constant-Q transform — log-frequency analysis at constant
frequency-to-bandwidth ratio (Brown 1991).

The session's mel view warps the STFT's fixed resolution; a CQT
analyzes each bin at its own scale, so every octave gets the same
number of bins at the same relative bandwidth — the musically-natural
view (12 bins/octave = semitones).  librosa computes this with
recursive downsampling + FFT tricks tuned for CPUs; on TPU the DIRECT
form is the right shape: all kernels live in one (frame_len, n_bins)
cos/sin matrix pair (each column a centered, windowed complex
exponential; zero outside its own support) and the whole transform is
framing + TWO GEMMs.  The kernel matrix for the standard 84-bin
geometry is a few MB — MXU fodder, no FFT needed.

Spec (pinned against a from-scratch numpy oracle in
tests/test_cqt.py; librosa is not in this image):
  Q = filter_scale / (2^(1/bins_per_octave) - 1)
  f_k = fmin * 2^(k / bins_per_octave)
  N_k = ceil(Q * sr / f_k)   (kernel support, hann-windowed,
                              L1-normalized: a unit tone reads 0.5)
Frames are centered with zero padding (hop_length apart); output is
the magnitude (n_frames, n_bins).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .stft import frame_device
from ..utils import next_pow2, round_up_to


@functools.lru_cache(maxsize=8)
def _cqt_kernels(sr: int, fmin: float, n_bins: int, bins_per_octave: int,
                 filter_scale: float):
    """(frame_len, n_bins) cos/sin kernel matrices, f64 design -> f32."""
    q = filter_scale / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    if freqs[-1] > sr / 2.0:
        raise ValueError(
            f"top CQT bin {freqs[-1]:.1f} Hz above Nyquist ({sr / 2}); "
            "lower n_bins or fmin"
        )
    lengths = np.ceil(q * sr / freqs).astype(int)
    frame_len = next_pow2(int(lengths[0]))
    c = np.zeros((frame_len, n_bins), np.float64)
    s = np.zeros((frame_len, n_bins), np.float64)
    center = frame_len // 2
    for k in range(n_bins):
        n = int(lengths[k])
        t = np.arange(n, dtype=np.float64) - (n - 1) / 2.0
        # periodic-symmetric hann over the support
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
        w /= w.sum()  # L1: a unit tone at f_k reads 0.5 (analytic half)
        ang = 2.0 * np.pi * freqs[k] * t / sr
        a = center - n // 2
        c[a:a + n, k] = w * np.cos(ang)
        s[a:a + n, k] = w * np.sin(ang)
    return (c.astype(np.float32), s.astype(np.float32), frame_len,
            freqs.astype(np.float32))


def cqt_frequencies(fmin: float = 32.70319566257483, n_bins: int = 84,
                    bins_per_octave: int = 12) -> np.ndarray:
    """Center frequency (Hz) of each CQT bin (fmin defaults to C1)."""
    return (fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
            ).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("frame_len", "hop", "n_frames")
)
def _cqt_core(padded_b, c, s, *, frame_len, hop, n_frames):
    prec = jax.lax.Precision.HIGHEST

    def one(padded):
        frames = frame_device(padded, frame_len, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im)

    return jax.vmap(one)(padded_b)


def cqt(
    wav,
    sr: int,
    *,
    fmin: float = 32.70319566257483,  # C1
    n_bins: int = 84,                 # 7 octaves
    bins_per_octave: int = 12,
    hop_length: int = 512,
    filter_scale: float = 1.0,
):
    """Constant-Q magnitude: (T,) or (B, T) -> (B?, n_frames, n_bins).

    Centered zero-padded frames ``hop_length`` apart; bin k peaks at
    ``cqt_frequencies(...)[k]`` with constant f/bandwidth ratio Q.  A
    unit-amplitude tone at a bin center reads ~0.5 in that bin (the
    analytic-kernel half, the classic convention).  All compute is two
    GEMMs against the precomputed kernel bank.
    """
    if n_bins < 1 or bins_per_octave < 1:
        raise ValueError(
            f"need n_bins/bins_per_octave >= 1, got "
            f"{n_bins}/{bins_per_octave}"
        )
    if fmin <= 0 or filter_scale <= 0:
        raise ValueError(
            f"fmin and filter_scale must be positive, got "
            f"{fmin}/{filter_scale}"
        )
    if hop_length < 1:
        raise ValueError(f"hop_length must be >= 1, got {hop_length}")
    is_dev = isinstance(wav, jax.Array)
    wav = (jnp.asarray(wav, jnp.float32) if is_dev
           else np.asarray(wav, dtype=np.float32))
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    if wav.ndim != 2:
        raise ValueError(f"wav must be (T,) or (B, T), got {wav.shape}")
    c, s, frame_len, _ = _cqt_kernels(
        int(sr), float(fmin), int(n_bins), int(bins_per_octave),
        float(filter_scale),
    )
    n = wav.shape[1]
    half = frame_len // 2
    n_frames = 1 + n // hop_length
    n_pad = round_up_to(n_frames, 128)
    need = (n_pad - 1) * hop_length + frame_len
    xp = jnp if is_dev else np
    padded = xp.zeros((wav.shape[0], need), xp.float32)
    if is_dev:
        padded = padded.at[:, half:half + n].set(wav)
    else:
        padded[:, half:half + n] = wav
    out = _cqt_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        frame_len=frame_len, hop=hop_length, n_frames=n_pad,
    )[:, :n_frames, :]
    return out[0] if squeeze else out
