"""Multitaper (Thomson DPSS) spectrogram — low-variance spectral view.

A single-window spectrogram trades variance for nothing: each (frame,
bin) power is a 2-dof chi-square estimate whose sigma EQUALS its mean,
which is the speckle every spectrogram viewer user knows.  Thomson's
multitaper estimate analyzes each frame with K orthogonal DPSS
(Slepian) tapers and averages the K eigenspectra, cutting the variance
~K-fold at a (controlled) 2NW-bin resolution cost — the standard tool
when the point of the display is to READ levels off the noise floor.

The reference (Sytronik/multi-spectrogram-viewer) only ever computes
the one-window STFT (src_rust/lib.rs:367-471); this is a capability
extension shaped for TPU: the K tapered DFTs are not K passes but ONE
GEMM against a horizontally-stacked (win, K*n_freq) matrix pair built
from the same phase-folded windowed-DFT construction the engine uses
(ops/dft.py), so the MXU sees a single wide matmul and the weighted
eigenspectrum average fuses behind it.

Conventions match :func:`msv_tpu.ops.stft.perform_stft`: centered
reflect padding, frames ``hop_length`` apart, zero-pad to ``n_fft``
folded into the matrix phase.  Tapers are unit-energy (||w||_2 = 1,
scipy's ``norm=2``), so white noise of variance v reads a flat
``v * win_length``-scaled floor and taper count does not change scale.
Pinned against a from-scratch numpy oracle in
tests/test_multitaper.py (librosa/nitime are not in this image).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dft import windowed_dft_matrices
from .framing import n_frames_for, reflect_pad_center
from .stft import frame_device
from ..utils import round_up_to


@functools.lru_cache(maxsize=16)
def _dpss_bank(win_length: int, n_fft: int, nw: float, n_tapers: int):
    """Stacked (win, K*n_freq) cos/sin matrices + eigenvalue weights.

    Each taper's matrix comes from the engine's own phase-folded
    windowed-DFT builder, so per-taper columns are bit-identical to
    running that taper through the standard path.
    """
    from scipy.signal import windows as _w

    tapers, ratios = _w.dpss(win_length, nw, Kmax=n_tapers, sym=False,
                             norm=2, return_ratios=True)
    tapers = np.atleast_2d(tapers)
    cs = [windowed_dft_matrices(t.astype(np.float32), n_fft)
          for t in tapers]
    c = np.concatenate([m[0] for m in cs], axis=1)
    s = np.concatenate([m[1] for m in cs], axis=1)
    # eigenvalue (energy-concentration) weights, normalized to sum 1
    lam = np.asarray(ratios, np.float64)
    w = (lam / lam.sum()).astype(np.float32)
    return c, s, w


@functools.partial(
    jax.jit, static_argnames=("win", "hop", "n_frames", "n_freq", "k")
)
def _mt_core(padded_b, c, s, lam, *, win, hop, n_frames, n_freq, k):
    prec = jax.lax.Precision.HIGHEST

    def one(padded):
        frames = frame_device(padded, win, hop, n_frames)
        re = jnp.dot(frames, c, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s, precision=prec,
                     preferred_element_type=jnp.float32)
        p = (re * re + im * im).reshape(n_frames, k, n_freq)
        return jnp.einsum("tkf,k->tf", p, lam)

    return jax.vmap(one)(padded_b)


def multitaper_spectrogram(
    wav,
    sr: int,
    *,
    win_length: int = 1024,
    hop_length: int = 256,
    n_fft: int | None = None,
    nw: float = 3.0,
    n_tapers: int | None = None,
):
    """Multitaper power spectrogram: (T,) or (B, T) -> (B?, frames, n_freq).

    ``nw`` is the time-bandwidth product (resolution widens to ~2*nw
    DFT bins); ``n_tapers`` defaults to the Thomson choice
    ``floor(2*nw) - 1`` (all tapers with eigenvalue ~1).  Eigenvalue-
    weighted average of the K unit-energy eigenspectra; frame centers
    match :func:`perform_stft` (centered, reflect padding).
    """
    if n_fft is None:
        n_fft = win_length
    if n_fft < win_length:
        raise ValueError(f"n_fft ({n_fft}) must be >= win_length "
                         f"({win_length})")
    if nw <= 0.5:
        raise ValueError(f"time-bandwidth nw must be > 0.5, got {nw}")
    if n_tapers is None:
        n_tapers = max(1, int(2 * nw) - 1)
    if not 1 <= n_tapers <= win_length:
        raise ValueError(f"n_tapers must be in [1, win_length], got "
                         f"{n_tapers}")
    if n_tapers >= 2 * nw:
        raise ValueError(
            f"n_tapers={n_tapers} exceeds the 2*NW-1={int(2 * nw) - 1} "
            f"well-concentrated count for nw={nw}; raise nw or lower "
            "n_tapers"
        )
    if hop_length < 1:
        raise ValueError(f"hop_length must be >= 1, got {hop_length}")

    is_dev = isinstance(wav, jax.Array)
    wav_np = wav if is_dev else np.asarray(wav, dtype=np.float32)
    squeeze = wav_np.ndim == 1
    if squeeze:
        wav_np = wav_np[None]
    if wav_np.ndim != 2:
        raise ValueError(f"wav must be (T,) or (B, T), got {wav_np.shape}")
    n = wav_np.shape[1]
    half = win_length // 2
    if n < half + 1:
        raise ValueError(
            f"signal too short for win_length={win_length}: need at "
            f"least {half + 1} samples, got {n}"
        )

    c, s, lam = _dpss_bank(int(win_length), int(n_fft), float(nw),
                           int(n_tapers))
    n_frames = n_frames_for(n, win_length, hop_length)
    n_pad = round_up_to(n_frames, 128)  # bounded jit cache (repo conv.)
    need = (n_pad - 1) * hop_length + win_length

    if is_dev:
        pads = jnp.pad(jnp.asarray(wav_np, jnp.float32),
                       ((0, 0), (half, half)), mode="reflect")
        m = min(pads.shape[1], need)
        padded = jnp.zeros((wav_np.shape[0], need), jnp.float32)
        padded = padded.at[:, :m].set(pads[:, :m])
    else:
        rows = [reflect_pad_center(w, win_length) for w in wav_np]
        padded = np.zeros((wav_np.shape[0], need), np.float32)
        for i, r in enumerate(rows):
            padded[i, :min(len(r), need)] = r[:need]

    out = _mt_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(lam),
        win=int(win_length), hop=int(hop_length), n_frames=int(n_pad),
        n_freq=int(n_fft) // 2 + 1, k=int(n_tapers),
    )[:, :n_frames, :]
    return out[0] if squeeze else out


def multitaper_spec_db(wav, sr: int, *, top_db: float | None = 80.0,
                       **kw):
    """dB view of :func:`multitaper_spectrogram` (power -> 10*log10,
    strict ``> amin`` floor per the repo's decibel convention), clamped
    to ``max - top_db`` like the feature frontend."""
    from .decibel import power_to_db

    p = multitaper_spectrogram(wav, sr, **kw)
    db = power_to_db(p)
    if top_db is not None:
        if top_db <= 0:
            raise ValueError(f"top_db must be positive, got {top_db}")
        axes = tuple(range(db.ndim - 2, db.ndim))
        db = jnp.maximum(db, jnp.max(db, axis=axes, keepdims=True)
                         - jnp.float32(top_db))
    return db
