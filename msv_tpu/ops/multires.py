"""Adaptive multi-resolution mel spectrogram.

The reference's roadmap aspires to "adaptive STFT — sth like iZotope RX
Editor" (ReadMe.md:18) but implements nothing.  This module provides a
working TPU-native version: the signal is analyzed at several window scales
sharing one hop grid, projected onto a COMMON mel basis, and blended per
time-frequency cell by local sharpness — transients take their detail from
the short windows, stationary harmonics from the long ones.

Design notes:
  * all scales share hop_length, and windows are forced even, so every
    scale yields the SAME frame count (n = floor(L/hop) + 1 for centered
    framing with even win) — the blend is a plain elementwise op;
  * a shared n_mel across scales (calc_mel_fb at each n_fft with the same
    band count) gives aligned frequency axes;
  * sharpness = |discrete Laplacian| of the dB image, box-smoothed; blend
    weights w_k ∝ sharpness_k^alpha (alpha=2), normalized.  The output is
    a convex combination, so every cell stays within [min_k, max_k] of the
    per-scale values;
  * everything after framing is GEMMs + shifts — MXU/VPU friendly, one jit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpecSetting, derive_stft_params
from ..utils import next_pow2, round_up_to
from .decibel import amp_to_db
from .dft import windowed_dft_matrices
from .framing import n_frames_for, reflect_pad_center
from .mel import calc_mel_fb
from .stft import frame_device
from .windows import hann


def _scale_params(sr: int, setting: SpecSetting, scales):
    base = derive_stft_params(sr, setting)
    hop = base.hop_length
    out = []
    for s in scales:
        win = max((base.win_length // int(s)) // 2 * 2, 4)  # even, >= 4
        n_fft = next_pow2(win) * setting.f_overlap
        out.append((win, n_fft))
    return hop, out


def multires_mel_spec_db(
    wav: np.ndarray,
    sr: int,
    setting: SpecSetting | None = None,
    scales=(1, 2, 4),
    n_mel: int = 128,
    alpha: float = 2.0,
):
    """Adaptive multi-resolution mel dB spectrogram.

    Returns (db (n_frames, n_mel) device array, n_frames).
    """
    setting = setting or SpecSetting()
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    hop, wins = _scale_params(sr, setting, scales)

    # per-scale pipelines share the frame grid: centered framing with even
    # windows yields identical n_frames for every scale
    n_frames = n_frames_for(len(wav), wins[0][0], hop)
    n_pad = round_up_to(max(n_frames, 1), 256)

    specs = []
    for win, n_fft in wins:
        window = (hann(win, False) / np.float32(n_fft)).astype(np.float32)
        c, s = windowed_dft_matrices(window, n_fft)
        fb = calc_mel_fb(sr, n_fft, n_mel, 0.0, None, True, np.float32)
        padded = reflect_pad_center(wav, win)
        need = (n_pad - 1) * hop + win
        if len(padded) < need:
            padded = np.pad(padded, (0, need - len(padded)))
        nf = n_frames_for(len(wav), win, hop)
        assert nf == n_frames, (win, hop, nf, n_frames)
        specs.append(
            _scale_spec(
                jnp.asarray(padded),
                jnp.asarray(c),
                jnp.asarray(s),
                jnp.asarray(fb),
                win=win,
                hop=hop,
                n_frames=n_pad,
            )
        )
    db = _blend(jnp.stack(specs), alpha=float(alpha))
    return db[:n_frames], n_frames


@functools.partial(jax.jit, static_argnames=("win", "hop", "n_frames"))
def _scale_spec(padded, c, s, fb, *, win, hop, n_frames):
    frames = frame_device(padded, win, hop, n_frames)
    prec = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, c, precision=prec, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, fb, precision=prec, preferred_element_type=jnp.float32)
    return amp_to_db(mel)


@functools.partial(jax.jit, static_argnames=("alpha",))
def _blend(specs, *, alpha):
    """specs (K, T, F) dB -> sharpness-weighted convex blend (T, F)."""

    def lap(x):  # discrete Laplacian magnitude per cell
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
        return jnp.abs(
            4.0 * x
            - xp[:, :-2, 1:-1]
            - xp[:, 2:, 1:-1]
            - xp[:, 1:-1, :-2]
            - xp[:, 1:-1, 2:]
        )

    def box3(x):  # 3x3 box smoothing of the sharpness field
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
        acc = jnp.zeros_like(x)
        for dy in range(3):
            for dx in range(3):
                acc = acc + xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2]]
        return acc / 9.0

    sharp = box3(lap(specs)) ** alpha
    w = sharp / jnp.maximum(jnp.sum(sharp, axis=0, keepdims=True), 1e-12)
    return jnp.sum(w * specs, axis=0)
