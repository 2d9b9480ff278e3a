"""Time-scale and pitch modification: the phase vocoder as one jitted
program.

The reference has no effects path at all (its DSP stack ends at
analysis/rendering, lib.rs:388-471); this closes the classic
analysis->modification->synthesis loop the TPU way.  The whole
``time_stretch`` — framing, windowed-DFT GEMMs, magnitude interpolation,
phase accumulation, inverse-rDFT GEMM, overlap-add — is ONE compiled
program: no per-frame host loop (the textbook formulation), no complex64
anywhere (the axon relay cannot execute it; re/im stay split).

TPU formulation notes:

- Magnitude interpolation and the frame-pair angle reads are per-step
  row lookups at ``floor(t)``/``floor(t)+1`` — two ``jnp.take`` row
  gathers whose (n_freq,)-contiguous slices amortize the TPU gather
  penalty (unlike element gathers, CLAUDE.md's 10-30x case).
- The phase recursion ``acc[i+1] = acc[i] + phi + d[i]`` is a plain
  prefix sum -> ``jnp.cumsum`` over the step axis, not a scan.
- f32 phase hygiene: the linear part ``i * phi`` reaches 1e7 rad within
  seconds of audio, where f32 carries whole-radian error.  It is exactly
  periodic mod 2pi with period ``P = n_fft / gcd(hop, n_fft)`` frames,
  so the core adds a host-f64-built ``(P, n_freq)`` table row
  ``(i mod P)`` instead, leaving only the bounded deviation sum
  (|d| <= pi) to f32 cumsum — worst-case phase error ~1e-3 rad at
  hour scale instead of ~1 rad at minute scale.
- Shape bucketing per repo convention: frame and step counts pad to
  FRAME_BUCKET; pad frames are zero-masked (their DFT rows are garbage,
  ops/stft.py:289), pad steps emit zero magnitude, and the OLA
  normalizer is built from true steps only (the griffin_lim pattern,
  ops/reconstruct.py:133-145).
"""

import functools
import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_precision_mode, precision_for
from ..utils import round_up_to
from .dft import inverse_rdft, n_pad_split, windowed_dft_matrices
from .reconstruct import _ola_constants
from .stft import FRAME_BUCKET, _prepare, frame_device

_TWO_PI = 2.0 * math.pi


def _phase_tables(hop: int, n_fft: int):
    """Host f64 phase constants: (phi mod 2pi, the (P, n_freq) linear-
    phase table with rows ``(i * phi) mod 2pi``)."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq, dtype=np.float64)
    phi = _TWO_PI * hop * k / n_fft  # nominal per-step advance
    period = n_fft // math.gcd(hop, n_fft)
    i = np.arange(period, dtype=np.float64)[:, None]
    table = np.mod(i * phi[None, :], _TWO_PI).astype(np.float32)
    return np.mod(phi, _TWO_PI).astype(np.float32), table


def _nearest_peak(mag):
    """Per row of a (S, K) magnitude array: the index of the nearest
    local maximum (ties to the left; rows without peaks lock to self).

    Vectorized with two cummax/cummin prefix scans — no loops; the final
    per-bin reads are lane gathers (take_along_axis), acceptable here
    because effects are clip-level, not the render hot path."""
    s, k = mag.shape
    neg = jnp.full((s, 1), -jnp.inf, mag.dtype)
    prev = jnp.concatenate([neg, mag[:, :-1]], axis=1)
    nxt = jnp.concatenate([mag[:, 1:], neg], axis=1)
    is_peak = (mag > prev) & (mag >= nxt)
    ks = jnp.arange(k, dtype=jnp.int32)[None, :]
    fwd = jax.lax.cummax(jnp.where(is_peak, ks, -1), axis=1)
    bwd = jax.lax.cummin(
        jnp.where(is_peak, ks, 2 * k), axis=1, reverse=True
    )
    dl = jnp.where(fwd >= 0, ks - fwd, k + 1)
    dr = jnp.where(bwd < k, bwd - ks, k + 1)
    p = jnp.where(dl <= dr, fwd, bwd)
    p = jnp.where((fwd >= 0) | (bwd < k), p, ks)
    return jnp.clip(p, 0, k - 1)


def _vocode(re, im, sel, frac, lin, phi, n_true, s_true, phase_lock):
    """Phase-vocode a (F, n_freq) re/im spectrogram to (S, n_freq).

    ``sel``/``frac`` are the host-built floor/fraction of the fractional
    frame positions; ``lin`` is the per-step linear phase (mod 2pi);
    ``n_true``/``s_true`` are traced true counts (pad rows masked).

    With ``phase_lock`` (identity phase locking, Laroche & Dolson 1999),
    only spectral peaks carry accumulated phase; every other bin is
    re-anchored to its nearest peak's accumulated phase plus the
    ORIGINAL peak-relative phase from the analysis frame.  This keeps
    each component's main lobe vertically coherent by construction —
    plain per-bin accumulation lets transient-frame frequency-estimate
    noise (e.g. the reflect-pad crease) spread the lobe's bins apart
    permanently, which partially cancels in the synthesis overlap-add
    (measured: a pure tone loses ~73% rms at rate 0.5 unlocked)."""
    valid = (jnp.arange(re.shape[0]) < n_true)[:, None].astype(re.dtype)
    re = re * valid
    im = im * valid
    mag = jnp.sqrt(re * re + im * im)
    ang = jnp.arctan2(im, re)  # masked rows: arctan2(0, 0) = 0

    sel1 = jnp.minimum(sel + 1, re.shape[0] - 1)
    # column t+1 reads as zero past the true frames (the zero-pad column
    # of the textbook formulation) — mask, because the clip above may
    # land sel+1 on a TRUE row when n_true == F_pad
    m1 = ((sel + 1) < n_true)[:, None].astype(re.dtype)
    m0 = jnp.take(mag, sel, axis=0)
    a0 = jnp.take(ang, sel, axis=0)
    m1v = jnp.take(mag, sel1, axis=0) * m1
    a1 = jnp.take(ang, sel1, axis=0) * m1

    smask = (jnp.arange(sel.shape[0]) < s_true)[:, None].astype(re.dtype)
    frac = frac[:, None]
    mag_o = ((1.0 - frac) * m0 + frac * m1v) * smask

    d = a1 - a0 - phi[None, :]
    d = d - _TWO_PI * jnp.round(d / _TWO_PI)  # wrap to [-pi, pi]
    dev = jnp.cumsum(d, axis=0)
    dev = jnp.concatenate([jnp.zeros_like(dev[:1]), dev[:-1]], axis=0)
    phase = ang[0][None, :] + lin + dev
    if phase_lock:
        p = _nearest_peak(mag_o)
        phase = (
            jnp.take_along_axis(phase, p, axis=1)
            + a0
            - jnp.take_along_axis(a0, p, axis=1)
        )
    return mag_o * jnp.cos(phase), mag_o * jnp.sin(phase)


@functools.partial(
    jax.jit,
    static_argnames=("win", "hop", "n_fft", "n_frames", "mode",
                     "phase_lock"),
)
def _pv_spec_core(padded, c, s, sel, frac, lin, phi, n_true, s_true, *,
                  win, hop, n_fft, n_frames, mode, phase_lock):
    frames = frame_device(padded, win, hop, n_frames)
    prec = precision_for(mode)
    re = jnp.dot(frames, c, precision=prec,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec,
                 preferred_element_type=jnp.float32)
    return _vocode(re, im, sel, frac, lin, phi, n_true, s_true, phase_lock)


@functools.partial(
    jax.jit,
    static_argnames=("win", "hop", "n_fft", "n_frames", "n_steps", "mode",
                     "phase_lock"),
)
def _pv_full_core(padded, c, s, syn, sel, frac, lin, phi, oidx, wsq,
                  n_true, s_true, *, win, hop, n_fft, n_frames, n_steps,
                  mode, phase_lock):
    """Analysis -> vocoder -> matched-window OLA synthesis, one program."""
    out_re, out_im = _pv_spec_core(
        padded, c, s, sel, frac, lin, phi, n_true, s_true,
        win=win, hop=hop, n_fft=n_fft, n_frames=n_frames, mode=mode,
        phase_lock=phase_lock,
    )
    pl, _ = n_pad_split(n_fft, win)
    frames_o = (
        inverse_rdft((out_re, out_im), n_fft)[:, pl:pl + win] * syn[None, :]
    )
    total = (n_steps - 1) * hop + win
    sig = jnp.zeros(total, jnp.float32).at[oidx].add(frames_o.ravel())
    return sig / wsq


def _stretch_plan(n_frames: int, rate: float, bucket: int):
    """Host step grid: (sel int32, frac f32, s_true), bucketed."""
    steps = np.arange(0, n_frames, rate, dtype=np.float64)
    s_true = len(steps)
    sel = np.floor(steps).astype(np.int32)
    frac = (steps - sel).astype(np.float32)
    s_pad = round_up_to(max(s_true, 1), bucket)
    sel = np.pad(sel, (0, s_pad - s_true))
    frac = np.pad(frac, (0, s_pad - s_true))
    return sel, frac, s_true


def time_stretch(
    wav,
    rate: float,
    *,
    win_length: int = 1024,
    hop_length: int = 256,
    n_fft: int | None = None,
    window=None,
    precision: str | None = None,
    phase_lock: bool = True,
):
    """Stretch a (T,) signal in time by ``1/rate`` without changing pitch.

    ``rate > 1`` speeds up (shorter output), ``rate < 1`` slows down;
    output length is ``round(T / rate)``.  Phase vocoder: magnitudes
    linearly interpolated at fractional frame positions ``i * rate``,
    phases advanced by the nominal hop phase plus the wrapped
    instantaneous deviation measured between the straddling frame pair,
    with identity phase locking by default (``phase_lock=False`` gives
    the textbook per-bin accumulator — see :func:`_vocode` for why
    locked is the default).  Runs as ONE jitted program (see module
    docstring); ``rate == 1`` short-circuits to the identity.

    Defaults (win 1024, hop 256, n_fft = win) are effect-quality
    analysis parameters independent of the viewer's session settings;
    pass the session's derived params to match a rendered spectrogram.
    """
    if not rate > 0:
        raise ValueError(f"rate must be positive, got {rate}")
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got shape {wav.shape}")
    if n_fft is None:
        n_fft = win_length
    if rate == 1.0:
        return wav.copy()
    out_len = int(round(len(wav) / rate))

    padded, c, s, n_frames, n_frames_pad = _prepare(
        wav, win_length, hop_length, n_fft, window, FRAME_BUCKET
    )
    sel, frac, s_true = _stretch_plan(n_frames, float(rate), FRAME_BUCKET)
    s_pad = len(sel)
    phi, table = _phase_tables(hop_length, n_fft)
    lin = table[np.arange(s_pad) % table.shape[0]]

    if window is None:
        from .windows import default_stft_window

        window = default_stft_window(win_length, n_fft)
    syn = np.ascontiguousarray(window, dtype=np.float32)
    oidx, _, _ = _ola_constants(s_pad, win_length, hop_length, syn)
    _, wsq, total_true = _ola_constants(s_true, win_length, hop_length, syn)
    total_pad = (s_pad - 1) * hop_length + win_length
    wsq = np.pad(wsq, (0, total_pad - total_true),
                 constant_values=np.float32(1e-24))

    mode = precision or get_precision_mode()
    sig = _pv_full_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(syn), jnp.asarray(sel), jnp.asarray(frac),
        jnp.asarray(lin), jnp.asarray(phi), jnp.asarray(oidx),
        jnp.asarray(wsq), jnp.int32(n_frames), jnp.int32(s_true),
        win=win_length, hop=hop_length, n_fft=n_fft,
        n_frames=n_frames_pad, n_steps=s_pad, mode=mode,
        phase_lock=bool(phase_lock),
    )
    # fetch-then-slice (griffin_lim pattern): audio output is host-bound
    # and a device slice would mint a program per distinct length
    half = win_length // 2
    out = np.asarray(sig)[half:half + out_len]
    if len(out) < out_len:  # OLA ran a few samples short of round(T/rate)
        out = np.pad(out, (0, out_len - len(out)))
    return out


def pitch_shift(
    wav,
    sr: int,
    n_steps: float,
    *,
    bins_per_octave: int = 12,
    win_length: int = 1024,
    hop_length: int = 256,
    n_fft: int | None = None,
    precision: str | None = None,
    phase_lock: bool = True,
):
    """Shift pitch by ``n_steps`` semitones (``bins_per_octave`` per
    octave) at constant duration: phase-vocoder stretch by
    ``2**(-n_steps/bins_per_octave)`` (an upshift first SLOWS the signal
    down) then resample the stretched signal back to the original length
    (ops/resample.py's single dilated conv), which scales every
    frequency by ``2**(n_steps/bins_per_octave)``.  The irrational
    semitone ratio is approximated by
    ``Fraction.limit_denominator(1000)`` (<= 0.02 cent error).  Output
    length equals the input's."""
    if bins_per_octave < 1:
        raise ValueError(
            f"bins_per_octave must be >= 1, got {bins_per_octave}"
        )
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if n_steps == 0:
        return wav.copy()
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    y = time_stretch(
        wav, rate, win_length=win_length, hop_length=hop_length,
        n_fft=n_fft, precision=precision, phase_lock=phase_lock,
    )
    frac = Fraction(rate).limit_denominator(1000)
    from .resample import resample_poly

    out = np.asarray(resample_poly(y, frac.numerator, frac.denominator))
    if len(out) < len(wav):
        out = np.pad(out, (0, len(wav) - len(out)))
    return out[: len(wav)]


# ------------------------------------------------------------- trim/split

@functools.partial(jax.jit, static_argnames=("win", "hop", "n_frames"))
def _frame_rms_core(padded, *, win, hop, n_frames):
    frames = frame_device(padded, win, hop, n_frames)
    return jnp.sqrt(jnp.mean(frames * frames, axis=1))


def _frame_rms(wav: np.ndarray, frame_length: int, hop_length: int):
    """Centered per-frame RMS of a (T,) signal -> (n_frames,) f32.
    Framing conventions match the feature frontend (centered,
    reflect-padded); frame counts bucket to 128 per repo convention."""
    from .framing import n_frames_for, reflect_pad_center

    n_frames = n_frames_for(len(wav), frame_length, hop_length)
    n_pad = round_up_to(max(n_frames, 1), 128)
    need = (n_pad - 1) * hop_length + frame_length
    padded = reflect_pad_center(wav, frame_length)
    padded = np.pad(padded, (0, max(0, need - len(padded))))[:need]
    rms = _frame_rms_core(jnp.asarray(padded), win=frame_length,
                          hop=hop_length, n_frames=n_pad)
    return np.asarray(rms)[:n_frames]


def split(wav, sr: int | None = None, *, top_db: float = 60.0,
          frame_length: int = 2048, hop_length: int = 512):
    """Non-silent intervals: (T,) -> (N, 2) int64 sample [start, end)
    pairs.

    A frame is silent when its RMS sits more than ``top_db`` below the
    loudest frame's (librosa.effects.split semantics; librosa is not
    in this image — pinned against a from-scratch oracle and
    constructed signals in tests/test_effects.py).  Frame RMS runs on
    device (one framing + reduce); the run-length extraction is host
    numpy on the tiny boolean vector.  ``sr`` is accepted for call-site
    symmetry but unused (thresholds are relative).  An all-silent
    (all-zero) signal returns an empty (0, 2) array.
    """
    del sr
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got {wav.shape}")
    if len(wav) == 0:
        return np.empty((0, 2), np.int64)
    if top_db <= 0:
        raise ValueError(f"top_db must be > 0, got {top_db}")
    if not (0 < hop_length <= frame_length):
        raise ValueError(
            f"need 0 < hop_length <= frame_length, got {hop_length}, "
            f"{frame_length}")
    if len(wav) < frame_length:  # short clip: shrink the analysis frame
        frame_length = max(2, len(wav))
        hop_length = min(hop_length, frame_length)
    rms = _frame_rms(wav, frame_length, hop_length)
    ref = float(rms.max())
    if ref <= 0.0:
        return np.empty((0, 2), np.int64)
    # strict > floor, matching the dB convention used everywhere else
    loud = 20.0 * np.log10(np.maximum(rms, 1e-20) / ref) > -top_db
    edges = np.diff(loud.astype(np.int8))
    starts = np.flatnonzero(edges == 1) + 1
    ends = np.flatnonzero(edges == -1) + 1
    if loud[0]:
        starts = np.concatenate([[0], starts])
    if loud[-1]:
        ends = np.concatenate([ends, [len(loud)]])
    n = len(wav)
    out = np.stack([starts, ends], axis=1) * hop_length
    return np.minimum(out, n).astype(np.int64)


def trim(wav, sr: int | None = None, *, top_db: float = 60.0,
         frame_length: int = 2048, hop_length: int = 512):
    """Strip leading/trailing silence: (T,) -> (trimmed, (start, end))
    with ``trimmed = wav[start:end]`` (librosa.effects.trim semantics).
    An all-silent signal returns an empty slice at (0, 0)."""
    iv = split(wav, sr, top_db=top_db, frame_length=frame_length,
               hop_length=hop_length)
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if len(iv) == 0:
        return wav[:0], (0, 0)
    a, b = int(iv[0, 0]), int(iv[-1, 1])
    return wav[a:b], (a, b)
