"""Cross-track time alignment — coarse NCC + GCC-PHAT refinement.

The one multi-track capability the reference leaves entirely to the
user's eyes: `thesia` renders N tracks on a shared time axis
(lib.rs:178-186 tracks only the common duration) but offers nothing to
DISCOVER the offset between two takes of the same material.  This
module estimates it:

1. **Coarse** (any lag up to ``max_lag_s``): RMS envelopes at ~100 fps
   (the framing machinery from ops/effects.py), zero-meaned, then
   normalized cross-correlation over every lag — computed as ONE
   grouped 1-D convolution (blocks of the reference envelope against
   sliding windows of the other, built with the zero-gather framing
   reshape; XLA sees a batched correlation, no per-lag loop).  A
   sliding-energy conv of the same shape normalizes per-lag overlap so
   large true offsets aren't penalized.
2. **Refine** (sub-hop precision): after shifting by the coarse
   estimate, classic GCC-PHAT on the overlap — Hann-windowed rDFT
   GEMM pairs (ops/dft.py), per-frame phase transform
   ``R/|R|`` of the cross-spectrum ``conj(Xa)·Xb``, mean over frames,
   ONE inverse rDFT GEMM, parabolic peak interpolation.  All GEMMs;
   the re/im pair representation sidesteps the axon relay's missing
   complex64 execution (same constraint as ops/hpss.py).

Sign convention: ``offset_s > 0`` means ``b``'s content happens LATER
— ``b(t + offset_s) ≈ a(t)``; playing ``b`` trimmed by ``offset_s``
(or delaying ``a`` by it) lines the takes up.

Rates may differ (the bundled reference samples are the same clip at
five rates — pinned as a zero-offset fixture in tests/test_align.py):
both sides resample to a common working rate first (ops/resample.py).

Caveat (inherent to any correlator): strictly periodic material is
ambiguous modulo its period — the coarse stage may lock onto an alias
one period away (measured with a 2 s-periodic synthetic).  The
``confidence`` field does not distinguish the alias; judge it against
the material.
"""

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import round_up_to
from .dft import inverse_rdft, windowed_dft_matrices
from .stft import frame_device
from .windows import hann

__all__ = ["align_offset", "AlignResult"]


class AlignResult(NamedTuple):
    offset_s: float      # b(t + offset_s) ≈ a(t)
    confidence: float    # coarse NCC peak: ~1 same material, ~0 unrelated
    coarse_s: float      # envelope-stage estimate (for diagnostics)


_ENV_FPS = 100           # coarse envelope rate
_BLOCK = 4096            # grouped-conv block width (envelope samples)
_REFINE_WIN = 4096       # GCC frame length at the working rate
_REFINE_NFFT = 8192      # zero-padded, so ±win/2 lags are acyclic
_REFINE_HOP = 2048
_MAX_REFINE_FRAMES = 512


@functools.partial(jax.jit, static_argnames=("n_blocks", "w", "b"))
def _lag_corr_core(a_pad, b_blocks, mask_blocks, *, n_blocks, w, b):
    """corr[κ] = Σ_t a_pad[t+κ]·b[t] and slide[κ] = Σ_t a_pad[t+κ]²·1[t<Tb]
    for κ in [0, w-b], as two grouped convolutions over blocks."""
    frames = frame_device(a_pad, w, b, n_blocks)          # (n_blocks, w)
    lhs = frames[None]                                    # (1, nb, w)
    rhs = b_blocks[:, None, :]                            # (nb, 1, b)
    corr = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        feature_group_count=n_blocks,
        preferred_element_type=jnp.float32)[0]            # (nb, w-b+1)
    slide = jax.lax.conv_general_dilated(
        (lhs * lhs), mask_blocks[:, None, :], window_strides=(1,),
        padding="VALID", feature_group_count=n_blocks,
        preferred_element_type=jnp.float32)[0]
    return corr.sum(0), slide.sum(0)


def _envelope(x: np.ndarray, sr: int) -> np.ndarray:
    from .effects import _frame_rms

    hop = max(1, sr // _ENV_FPS)
    env = _frame_rms(np.asarray(x, np.float32), 2 * hop, hop)
    return env - float(env.mean())


def _coarse_lag(ea: np.ndarray, eb: np.ndarray, max_lag: int):
    """Best lag κ* of ``eb`` inside ``ea`` over κ ∈ [-max_lag, max_lag]
    (in envelope frames) by overlap-normalized cross-correlation."""
    # round the half-width so 2K is a _BLOCK multiple: the sliding
    # window then frames with gcd = _BLOCK (zero-gather reshape path)
    k = round_up_to(max(max_lag, 1), _BLOCK // 2)
    tb = len(eb)
    n_blocks = max(1, -(-tb // _BLOCK))
    n_blocks = round_up_to(n_blocks, 8)   # bucket the compiled family
    tb_pad = n_blocks * _BLOCK
    w = _BLOCK + 2 * k
    need = tb_pad + 2 * k
    a_pad = np.zeros(need, np.float32)
    a_pad[k:k + min(len(ea), tb_pad + k)] = ea[:tb_pad + k]
    b_blocks = np.zeros(tb_pad, np.float32)
    b_blocks[:tb] = eb
    mask = np.zeros(tb_pad, np.float32)
    mask[:tb] = 1.0
    corr, slide = _lag_corr_core(
        jnp.asarray(a_pad), jnp.asarray(b_blocks.reshape(n_blocks, _BLOCK)),
        jnp.asarray(mask.reshape(n_blocks, _BLOCK)),
        n_blocks=n_blocks, w=w, b=_BLOCK)
    corr, slide = np.asarray(corr), np.asarray(slide)
    nb = float(np.sqrt(np.sum(eb * eb))) or 1.0
    ncc = corr / (np.sqrt(np.maximum(slide, 1e-12)) * nb)
    # restrict to the caller's actual lag range (we rounded k up)
    lo, hi = k - max_lag, k + max_lag + 1
    ncc_win = ncc[lo:hi]
    i = int(np.argmax(ncc_win))
    return i - max_lag, float(ncc_win[i])


def _parabolic(y3) -> float:
    y0, y1, y2 = (float(v) for v in y3)
    denom = y0 - 2.0 * y1 + y2
    if abs(denom) < 1e-12:
        return 0.0
    return float(np.clip(0.5 * (y0 - y2) / denom, -1.0, 1.0))


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _gcc_phat_core(fa, fb, n_true, c, s, *, n_frames):
    """Mean per-frame PHAT-weighted cross-spectrum -> (n_fft,) GCC."""
    xar, xai = fa @ c, fa @ s
    xbr, xbi = fb @ c, fb @ s
    # conj(Xa)·Xb: peak index of the inverse transform = delay of b
    rre = xar * xbr + xai * xbi
    rim = xar * xbi - xai * xbr
    mag = jnp.sqrt(rre * rre + rim * rim) + 1e-12
    valid = (jnp.arange(n_frames) < n_true)[:, None]
    scale = jnp.where(valid, 1.0 / (mag * n_true), 0.0)
    mre = jnp.sum(rre * scale, axis=0)
    mim = jnp.sum(rim * scale, axis=0)
    return inverse_rdft((mre, mim), _REFINE_NFFT)


def _refine(a: np.ndarray, b: np.ndarray, sr: int, search: int):
    """Sub-sample GCC-PHAT delay of ``b`` vs ``a`` (both already
    coarse-aligned and equal length), searched over ±``search``
    samples.  Returns (delay_samples, peak_value)."""
    win, hop, n_fft = _REFINE_WIN, _REFINE_HOP, _REFINE_NFFT
    t = min(len(a), len(b))
    if t < win:
        pad = win - t
        a = np.pad(a[:t], (0, pad))
        b = np.pad(b[:t], (0, pad))
        t = win
    n_true = min(1 + (t - win) // hop, _MAX_REFINE_FRAMES)
    # center the analyzed span for the frame budget
    if 1 + (t - win) // hop > n_true:
        start = ((1 + (t - win) // hop - n_true) // 2) * hop
        a, b = a[start:], b[start:]
    n_frames = round_up_to(n_true, 128)
    need = (n_frames - 1) * hop + win
    a = np.pad(a, (0, max(0, need - len(a))))[:need]
    b = np.pad(b, (0, max(0, need - len(b))))[:need]
    c, s = windowed_dft_matrices(hann(win), n_fft)
    fa = frame_device(jnp.asarray(a, jnp.float32), win, hop, n_frames)
    fb = frame_device(jnp.asarray(b, jnp.float32), win, hop, n_frames)
    gcc = np.asarray(_gcc_phat_core(
        fa, fb, jnp.int32(n_true), jnp.asarray(c), jnp.asarray(s),
        n_frames=n_frames))
    # circular lags: index ℓ = delay ℓ, index n_fft-ℓ = delay -ℓ
    search = int(min(search, win // 2 - 1))
    lags = np.arange(-search, search + 1)
    vals = gcc[lags % n_fft]
    i = int(np.argmax(vals))
    frac = _parabolic(vals[max(i - 1, 0):i + 2]) if 0 < i < len(vals) - 1 \
        else 0.0
    return float(lags[i]) + frac, float(vals[i])


def align_offset(a, sr_a: int, b, sr_b: int, *, max_lag_s: float = 30.0,
                 work_sr: int | None = None, refine: bool = True
                 ) -> AlignResult:
    """Estimate how much later ``b``'s content occurs than ``a``'s.

    ``a``/``b``: (T,) mono float arrays at ``sr_a``/``sr_b`` (rates may
    differ).  Searches offsets in ±``max_lag_s`` seconds.  Precision:
    ~1/``work_sr`` with ``refine=True`` (default: the smaller of the
    two rates, capped at 16 kHz), ~10 ms without.
    """
    a = np.asarray(a, np.float32).reshape(-1)
    b = np.asarray(b, np.float32).reshape(-1)
    if not len(a) or not len(b):
        raise ValueError("align_offset: empty input")
    if max_lag_s <= 0:
        raise ValueError(f"max_lag_s must be positive, got {max_lag_s}")
    if work_sr is None:
        work_sr = min(int(sr_a), int(sr_b), 16000)
    if work_sr < 2 * _ENV_FPS:
        raise ValueError(f"work_sr too low: {work_sr}")
    from .resample import resample

    if sr_a != work_sr:
        a = np.asarray(resample(a, int(sr_a), work_sr), np.float32)
    if sr_b != work_sr:
        b = np.asarray(resample(b, int(sr_b), work_sr), np.float32)

    hop = max(1, work_sr // _ENV_FPS)
    max_lag = max(1, int(math.ceil(max_lag_s * work_sr / hop)))
    lag_env, conf = _coarse_lag(_envelope(a, work_sr),
                                _envelope(b, work_sr), max_lag)
    # _coarse_lag peaks at ℓ with eb[t] ≈ ea[t+ℓ]; a delayed copy
    # eb[t] = ea[t-d] peaks at ℓ = -d, so b is later by -ℓ frames
    coarse = -lag_env * hop  # samples at work_sr; b later by `coarse`
    coarse_s = coarse / work_sr
    if not refine:
        return AlignResult(coarse_s, conf, coarse_s)

    # shift b back by the coarse offset, refine on the overlap
    if coarse >= 0:
        a2, b2 = a, b[coarse:]
    else:
        a2, b2 = a[-coarse:], b
    delay, _peak = _refine(a2, b2, work_sr, 4 * hop)
    total = (coarse + delay) / work_sr
    return AlignResult(float(total), conf, float(coarse_s))
