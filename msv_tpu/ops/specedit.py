"""Spectral editing — time-frequency box gain / erase / patch repair.

The other half of the "iZotope RX editor" capability the reference's
roadmap names (`ReadMe.md:18`) — the viewer SHOWS the spectrogram; this
lets the user act on a region of it: duck or erase a time-frequency
rectangle (a cough, a beep, mains hum over a span), or PATCH it by
interpolating the magnitude across the gap from the clean frames either
side (the classic spectral-repair move for transient events).

One jitted program, the ops/denoise.py shape: framing -> windowed-rDFT
GEMM pair -> per-cell gain -> inverse-rDFT GEMM -> overlap-add.  The
box geometry is host work: boxes are few and tiny, so the (frames,
n_freq) gain mask is built in numpy with raised-cosine feathering on
all four edges (hard edges ring across the OLA) and uploaded as ONE
operand; the device applies it to re/im — phase is untouched for gain
edits.  Patches REPLACE each cell: magnitude linearly interpolated
between the clean frame on each side (two row `take`s off host-built
index vectors — no per-box control flow, no dynamic shapes), phase
synthesized by propagating the left boundary's phase at each bin's
MEASURED instantaneous frequency (the phase-vocoder estimate from the
two clean frames left of the span: bin-center advance plus the
principal-value deviation).  Two rejected designs, both measured on a
click-in-tone fixture: keeping the ORIGINAL phase preserves the in-bin
interference the patch is meant to remove (error -0.7 dB vs the
corrupted input), and propagating at the bin-CENTER frequency drifts
~65 deg across a 60 ms span for an off-bin tone, which the 4x-overlap
OLA turns into amplitude cancellation (error +1.9 dB — worse than the
click).  Measured-frequency propagation takes it below -20 dB.

Pinned in tests/test_specedit.py against a from-scratch f64 numpy
STFT/mask/OLA oracle, plus semantic contracts: an erased tone drops by
the asked dB while a co-present tone outside the box moves < 0.1 dB,
no-box output equals the analysis/synthesis roundtrip, a patched click
vanishes into the surrounding tone.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .dft import inverse_rdft, n_pad_split, windowed_dft_matrices
from .framing import n_frames_for, reflect_pad_center
from .reconstruct import _ola_constants
from .stft import frame_device
from .windows import default_stft_window
from ..utils import round_up_to

__all__ = ["spectral_edit", "Box"]


class Box:
    """One edit region: seconds x Hz, either a gain or a patch.

    ``gain_db`` < 0 ducks (e.g. -18), very negative erases (-80);
    ``mode="patch"`` ignores gain_db and linearly interpolates each
    bin's magnitude across the time span from the clean frame on each
    side (phase kept).
    """

    __slots__ = ("t0", "t1", "f0", "f1", "gain_db", "mode")

    def __init__(self, t0, t1, f0, f1, gain_db=-80.0, mode="gain"):
        self.t0, self.t1 = float(t0), float(t1)
        self.f0, self.f1 = float(f0), float(f1)
        self.gain_db = float(gain_db)
        self.mode = str(mode)
        if not (0.0 <= self.t0 < self.t1):
            raise ValueError(f"bad time span [{t0}, {t1})")
        if not (0.0 <= self.f0 < self.f1):
            raise ValueError(f"bad frequency band [{f0}, {f1})")
        if self.mode not in ("gain", "patch"):
            raise ValueError(f"mode must be 'gain' or 'patch': {mode}")


def _feather(length: int, ramp: int, lo: bool = True, hi: bool = True):
    """1.0 plateau with raised-cosine ramps of ``ramp`` cells inward.

    ``lo``/``hi`` disable the ramp on an edge that sits on a physical
    boundary (DC/Nyquist, signal start/end) — there is nothing beyond
    it to blend with, and feathering there LEAKS the region being
    edited (measured: a DC-side ramp passed enough of a click's
    low-frequency energy to halve the patch's repair)."""
    w = np.ones(length, np.float32)
    r = min(ramp, length // 2)
    if r > 0:
        edge = 0.5 - 0.5 * np.cos(
            np.pi * (np.arange(1, r + 1, dtype=np.float64)) / (r + 1))
        if lo:
            w[:r] = edge
        if hi:
            w[length - r:] = edge[::-1]
    return w


def _build_masks(boxes, sr, n_frames, n_freq, hop, n_fft,
                 feather_t, feather_f):
    """Host geometry: the (n_frames, n_freq) linear gain mask for gain
    boxes, plus the patch weight/indices (see module doc)."""
    gain = np.ones((n_frames, n_freq), np.float32)
    patch_w = np.zeros((n_frames, n_freq), np.float32)
    left = np.arange(n_frames, dtype=np.int32)
    right = np.arange(n_frames, dtype=np.int32)
    alpha = np.zeros(n_frames, np.float32)
    steps = np.zeros(n_frames, np.float32)  # frames since left boundary
    hz_per_bin = sr / n_fft
    spans = []
    for b in boxes:
        fa = max(int(math.floor(b.t0 * sr / hop)), 0)
        fb = min(int(math.ceil(b.t1 * sr / hop)) + 1, n_frames)
        ka = max(int(math.floor(b.f0 / hz_per_bin)), 0)
        kb = min(int(math.ceil(b.f1 / hz_per_bin)) + 1, n_freq)
        if fb - fa < 1 or kb - ka < 1:
            continue  # fully outside the signal/band
        ft = _feather(fb - fa, feather_t, lo=fa > 0, hi=fb < n_frames)
        ff = _feather(kb - ka, feather_f, lo=ka > 0, hi=kb < n_freq)
        w = ft[:, None] * ff[None, :]
        if b.mode == "gain":
            g = np.float32(10.0 ** (b.gain_db / 20.0))
            # compose: each box pulls its cells toward its gain by its
            # feather weight; overlapping boxes multiply
            gain[fa:fb, ka:kb] *= (1.0 - w) + w * g
        else:
            if fa < 2 or fb >= n_frames:
                raise ValueError(
                    "patch box needs two clean frames on the left and "
                    "one on the right (the phase-velocity estimate) — "
                    f"got frames [{fa}, {fb}) of {n_frames}")
            for a0, b0 in spans:
                if fa < b0 and a0 < fb:
                    raise ValueError(
                        "patch boxes must not overlap in time")
            spans.append((fa, fb))
            patch_w[fa:fb, ka:kb] = np.maximum(
                patch_w[fa:fb, ka:kb], w)
            t = np.arange(fa, fb, dtype=np.float64)
            left[fa:fb] = fa - 1
            right[fa:fb] = fb
            alpha[fa:fb] = ((t - (fa - 1)) / (fb - (fa - 1))).astype(
                np.float32)
            steps[fa:fb] = (t - (fa - 1)).astype(np.float32)
    return gain, patch_w, left, right, alpha, steps


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_fft", "n_frames")
)
def _specedit_core(padded, c, s, syn, idx, wsq, gain, patch_w, left,
                   right, alpha, steps, n_valid, *, win, hop, n_fft,
                   n_frames):
    pl, _ = n_pad_split(n_fft, win)
    total = (n_frames - 1) * hop + win
    frames = frame_device(padded, win, hop, n_frames)
    prec = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, c, precision=prec,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec,
                 preferred_element_type=jnp.float32)
    # zero the bucket-pad rows: their OLA mass has no matching window
    # energy in the true-frames normalizer (the hpss/denoise lesson)
    rowmask = (jnp.arange(n_frames)[:, None] < n_valid).astype(
        jnp.float32)
    re = re * rowmask
    im = im * rowmask
    mag = jnp.sqrt(re * re + im * im)
    # patch targets: per-bin magnitude interpolation between the clean
    # frames either side of each span (two row-takes, host indices) ...
    mag_l = jnp.take(mag, left, axis=0)
    mag_r = jnp.take(mag, right, axis=0)
    target = (1.0 - alpha[:, None]) * mag_l + alpha[:, None] * mag_r
    # ... with phase propagated from the left boundary at each bin's
    # center frequency (see module doc)
    re_l = jnp.take(re, left, axis=0)
    im_l = jnp.take(im, left, axis=0)
    re_l2 = jnp.take(re, jnp.maximum(left - 1, 0), axis=0)
    im_l2 = jnp.take(im, jnp.maximum(left - 1, 0), axis=0)
    nom = (2.0 * jnp.pi * jnp.float32(hop) / jnp.float32(n_fft)
           ) * jnp.arange(re.shape[1], dtype=jnp.float32)[None, :]
    ph_l = jnp.arctan2(im_l, re_l)
    dev = ph_l - jnp.arctan2(im_l2, re_l2) - nom
    two_pi = jnp.float32(2.0 * np.pi)
    dev = dev - two_pi * jnp.round(dev / two_pi)  # principal value
    ph = ph_l + steps[:, None] * (nom + dev)
    re_g = re * gain
    im_g = im * gain
    re_o = (1.0 - patch_w) * re_g + patch_w * target * jnp.cos(ph)
    im_o = (1.0 - patch_w) * im_g + patch_w * target * jnp.sin(ph)
    fr = inverse_rdft((re_o, im_o), n_fft)[:, pl:pl + win]
    sig = jnp.zeros(total, jnp.float32).at[idx].add(
        (fr * syn[None, :]).ravel())
    return sig / wsq


def spectral_edit(
    wav,
    sr: int,
    boxes,
    *,
    win_length: int = 1024,
    hop_length: int = 256,
    n_fft: int | None = None,
    feather_ms: float = 20.0,
    feather_hz: float = 60.0,
    window=None,
):
    """Apply time-frequency box edits to ``wav`` -> same-length float32.

    ``boxes``: iterable of :class:`Box` (or dicts with the same keys).
    STFT conventions match :func:`~msv_tpu.ops.stft.perform_stft`
    (centered, reflect padding; the window scale cancels in the
    roundtrip).  Feathering defaults soften edges over ~20 ms / ~60 Hz.
    """
    wav = np.asarray(wav, np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got {wav.shape}")
    if n_fft is None:
        n_fft = win_length
    if n_fft < win_length:
        raise ValueError(f"n_fft {n_fft} < win_length {win_length}")
    half = win_length // 2
    if len(wav) < half + 1:
        raise ValueError(
            f"signal too short for win_length={win_length}")
    bs = []
    for b in boxes:
        if isinstance(b, dict):
            b = Box(b["t0"], b["t1"], b["f0"], b["f1"],
                    b.get("gain_db", -80.0), b.get("mode", "gain"))
        if not isinstance(b, Box):
            raise TypeError(f"box must be Box or dict, got {type(b)}")
        if b.f0 >= sr / 2:
            raise ValueError(f"box band starts above Nyquist: {b.f0}")
        bs.append(b)
    if not bs:
        raise ValueError("no boxes given")

    n_frames = n_frames_for(len(wav), win_length, hop_length)
    n_freq = n_fft // 2 + 1
    n_pad = round_up_to(n_frames, 128)
    gain, patch_w, left, right, alpha, steps = _build_masks(
        bs, sr, n_frames, n_freq, hop_length, n_fft,
        feather_t=max(int(round(feather_ms / 1000.0 * sr / hop_length)),
                      1),
        feather_f=max(int(round(feather_hz * n_fft / sr)), 1),
    )
    # bucket-pad the mask rows as identity; index vectors to self
    gain = np.pad(gain, ((0, n_pad - n_frames), (0, 0)),
                  constant_values=1.0)
    patch_w = np.pad(patch_w, ((0, n_pad - n_frames), (0, 0)))
    pad_ix = np.arange(n_frames, n_pad, dtype=np.int32)
    left = np.concatenate([left, pad_ix])
    right = np.concatenate([right, pad_ix])
    alpha = np.pad(alpha, (0, n_pad - n_frames))
    steps = np.pad(steps, (0, n_pad - n_frames))

    if window is None:
        window = default_stft_window(win_length, n_fft)
    window = np.ascontiguousarray(window, dtype=np.float32)
    c, s = windowed_dft_matrices(window, n_fft)
    need = (n_pad - 1) * hop_length + win_length
    padded = np.pad(
        reflect_pad_center(wav, win_length),
        (0, max(0, need - (len(wav) + 2 * half))))[:need]
    idx, _, total_pad = _ola_constants(n_pad, win_length, hop_length,
                                       window)
    _, wsq, total_true = _ola_constants(n_frames, win_length, hop_length,
                                        window)
    wsq = np.pad(wsq, (0, total_pad - total_true),
                 constant_values=np.float32(1e-24))
    out = _specedit_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(window), jnp.asarray(idx), jnp.asarray(wsq),
        jnp.asarray(gain), jnp.asarray(patch_w), jnp.asarray(left),
        jnp.asarray(right), jnp.asarray(alpha), jnp.asarray(steps),
        jnp.int32(n_frames),
        win=win_length, hop=hop_length, n_fft=n_fft, n_frames=n_pad,
    )
    return np.asarray(out)[half:half + len(wav)]
