"""Fundamental-frequency (pitch) tracking — YIN, MXU-shaped.

de Cheveigne & Kawahara 2002 ("YIN, a fundamental frequency estimator
for speech and music"), the classic algorithm behind librosa.yin.  The
viewer shows harmonics; this measures them — the viewer overlay
(`/api/pitch`) draws the f0 contour on the spectrogram.

TPU formulation: the per-frame difference function d(tau) =
sum_j (x_j - x_{j+tau})^2 expands to e(0) + e(tau) - 2 r(tau); the
running energies e are cumsums and the correlation r is computed for
ALL frames at once as three GEMMs — an end-padded real DFT pair,
elementwise cross-power (x against its windowed prefix), and one
inverse-rDFT.  Trough selection is loop-free: a local-minimum mask,
`argmax` for the first below-threshold trough, a global-min fallback
(librosa's convention), and parabolic interpolation off a 3-point
gather.  One jitted program per (n_frames bucket, geometry).

Pinned against a from-scratch numpy oracle of the same spec in
tests/test_pitch.py (librosa is not in this image) plus semantic
pins (tones, vibrato tracking, octave errors, silence).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .dft import end_padded_rdft_matrices, inverse_rdft
from .stft import frame_device
from ..utils import next_pow2, round_up_to

# correlation analyses share the end-anchored DFT builder (ops/dft.py)
_end_padded_dft = end_padded_rdft_matrices


@functools.partial(
    jax.jit,
    static_argnames=("frame_length", "win_length", "hop", "n_frames",
                     "n_fft", "pmin", "pmax", "threshold"),
)
def _yin_core(padded, cx, sx, cw, sw, *, frame_length, win_length, hop,
              n_frames, n_fft, pmin, pmax, threshold):
    frames = frame_device(padded, frame_length, hop, n_frames)
    prec = jax.lax.Precision.HIGHEST

    # r(tau), tau = 0..pmax: circular cross-correlation of each frame
    # with its own windowed prefix.  n_fft >= pmax + win_length keeps the
    # negative-lag tail clear of [0, pmax].
    a = jnp.dot(frames, cx, precision=prec,
                preferred_element_type=jnp.float32)
    b = jnp.dot(frames, sx, precision=prec,
                preferred_element_type=jnp.float32)
    w = frames[:, :win_length]
    c = jnp.dot(w, cw, precision=prec, preferred_element_type=jnp.float32)
    d_ = jnp.dot(w, sw, precision=prec, preferred_element_type=jnp.float32)
    re = a * c + b * d_          # X * conj(W)
    im = b * c - a * d_
    r = inverse_rdft((re, im), n_fft)[:, : pmax + 1]

    # e(tau) = sum x[tau : tau+W]^2 via one cumsum
    cs = jnp.cumsum(frames * frames, axis=1)
    zero = jnp.zeros((frames.shape[0], 1), jnp.float32)
    cs = jnp.concatenate([zero, cs], axis=1)
    e = cs[:, win_length : win_length + pmax + 1] - cs[:, : pmax + 1]

    d = jnp.maximum(e[:, :1] + e - 2.0 * r, 0.0)  # difference fn, >= 0

    # cumulative mean normalized difference; d'(0) = 1 by definition
    tau = jnp.arange(pmax + 1, dtype=jnp.float32)
    cum = jnp.cumsum(d, axis=1)
    cmnd = jnp.where(
        tau[None, :] > 0, d * tau[None, :] / jnp.maximum(cum, 1e-12), 1.0
    )

    # troughs within [pmin, pmax-1] (parabolic neighbors must exist)
    prev = cmnd[:, :-2]
    mid = cmnd[:, 1:-1]
    nxt = cmnd[:, 2:]
    is_trough = (mid < prev) & (mid <= nxt)
    t_idx = jnp.arange(1, pmax, dtype=jnp.int32)
    in_range = (t_idx >= pmin)[None, :]
    trough = is_trough & in_range
    below = trough & (mid < jnp.float32(threshold))
    has_below = below.any(axis=1)
    first_below = jnp.argmax(below, axis=1)
    # fallback: the lowest in-range trough; if NO trough exists at all
    # (monotone cmnd), the masked argmin lands on the in-range minimum
    masked = jnp.where(trough, mid, jnp.float32(np.inf))
    masked = jnp.where(in_range, masked,
                       jnp.float32(np.inf))
    any_trough = jnp.isfinite(masked).any(axis=1)
    global_min = jnp.argmin(masked, axis=1)
    plain_min = jnp.argmin(jnp.where(in_range, mid, jnp.float32(np.inf)),
                           axis=1)
    fallback = jnp.where(any_trough, global_min, plain_min)
    best = jnp.where(has_below, first_below, fallback) + 1  # -> cmnd index

    take = lambda off: jnp.take_along_axis(  # noqa: E731
        cmnd, (best + off)[:, None], axis=1)[:, 0]
    va, vb, vc = take(-1), take(0), take(1)
    # parabolic vertex of (va, vb, vc) around integer lag `best`
    denom = va - 2.0 * vb + vc
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      jnp.clip(0.5 * (va - vc) / denom, -0.5, 0.5), 0.0)
    period = best.astype(jnp.float32) + shift
    ap = vb + 0.25 * (va - vc) * shift  # interpolated trough depth
    ap = jnp.maximum(ap, 0.0)
    # digital silence: d(tau) == 0 for every lag makes the CMND 0/0,
    # which the 1e-12 clamp resolves to 0 ("perfectly periodic") — the
    # wrong degenerate for a frame with no signal.  Report fully
    # aperiodic instead so voicing gates drop it.
    ap = jnp.where(cum[:, -1] > 0.0, ap, 1.0)
    return period, ap


def yin(
    wav,
    sr: int,
    *,
    fmin: float = 65.0,
    fmax: float = 2093.0,
    frame_length: int = 2048,
    win_length: int | None = None,
    hop_length: int | None = None,
    trough_threshold: float = 0.1,
    with_aperiodicity: bool = False,
):
    """Per-frame f0 in Hz: (T,) -> (n_frames,) float32.

    Centered frames (``frame_length``, hop default ``frame_length//4``)
    with zero padding; the difference-function window defaults to
    ``frame_length//2``.  Search band [``fmin``, ``fmax``] Hz.  Frames
    with no trough below ``trough_threshold`` fall back to the lowest
    trough (the librosa convention) — gate on the aperiodicity to drop
    unvoiced frames: ``with_aperiodicity=True`` returns ``(f0, ap)``
    where ``ap`` is the CMND trough depth (~0 pure periodicity, ~1
    noise; > ~0.2-0.3 is a reasonable unvoiced cut).
    """
    wav = np.asarray(wav, np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got {wav.shape}")
    if win_length is None:
        win_length = frame_length // 2
    if hop_length is None:
        hop_length = frame_length // 4
    if not (0 < win_length < frame_length):
        raise ValueError(
            f"win_length must be in (0, frame_length), got {win_length}"
        )
    if hop_length < 1:
        raise ValueError(f"hop_length must be >= 1, got {hop_length}")
    if not (0.0 < fmin < fmax):
        raise ValueError(f"need 0 < fmin < fmax, got {fmin}, {fmax}")
    if fmax > sr / 2:
        raise ValueError(f"fmax {fmax} above Nyquist ({sr / 2})")
    pmin = max(int(math.floor(sr / fmax)), 1)
    pmax = min(int(math.ceil(sr / fmin)), frame_length - win_length - 1)
    if pmax <= pmin + 1:
        raise ValueError(
            f"period range [{pmin}, {pmax}] too narrow: raise "
            "frame_length or widen [fmin, fmax]"
        )
    half = frame_length // 2
    n = len(wav)
    if n < 1:
        raise ValueError("empty signal")
    n_frames = 1 + (n + 2 * half - frame_length) // hop_length
    n_pad = round_up_to(n_frames, 128)
    need = (n_pad - 1) * hop_length + frame_length
    padded = np.zeros(need, np.float32)
    padded[half : half + n] = wav

    n_fft = next_pow2(frame_length)
    assert n_fft >= pmax + win_length  # circular-correlation safety
    cx, sx = _end_padded_dft(frame_length, n_fft)
    cw, sw = _end_padded_dft(win_length, n_fft)
    period, ap = _yin_core(
        jnp.asarray(padded), jnp.asarray(cx), jnp.asarray(sx),
        jnp.asarray(cw), jnp.asarray(sw),
        frame_length=frame_length, win_length=win_length, hop=hop_length,
        n_frames=n_pad, n_fft=n_fft, pmin=pmin, pmax=pmax,
        threshold=float(trough_threshold),
    )
    f0 = (jnp.float32(sr) / period)[:n_frames]
    if with_aperiodicity:
        return f0, ap[:n_frames]
    return f0
