"""NMF spectrogram decomposition + source separation.

Non-negative matrix factorization of the magnitude spectrogram
(V ~= W @ H, W >= 0 the spectral templates, H >= 0 their activations)
is the classic unsupervised separator: each component k yields a
Wiener mask (W_k H_k) / (W H) and a masked inverse STFT gives its
audio.  The reference (Sytronik/multi-spectrogram-viewer) ships no
separation at all; this extends the repo's HPSS with a
component-count-controlled decomposition (drums vs tones vs hum, note
templates, ...).

TPU shape: Lee-Seung multiplicative updates for the KL divergence are
FOUR GEMMs per iteration — the whole optimization is one
``lax.fori_loop`` of MXU work with no data-dependent control flow, and
the masked resynthesis reuses the engine's inverse-rDFT GEMM + OLA
index-add (ops/reconstruct.py machinery, same as HPSS).  Everything
rides re/im pairs (the axon relay cannot execute complex64).

Update rule (Lee & Seung 2001, KL):
  H <- H * (W^T (V / (W H))) / (W^T 1)
  W <- W * ((V / (W H)) H^T) / (1 H^T)
which never leaves the nonnegative orthant and monotonically decreases
  D_KL(V || WH) = sum V log(V / WH) - V + WH
(pinned in tests/test_nmf.py against a from-scratch numpy oracle;
sklearn's NMF exists in-image but uses a different default solver/init,
so the oracle is the update rule itself).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dft import inverse_rdft, n_pad_split, windowed_dft_matrices
from .reconstruct import _ola_constants
from .stft import frame_device
from .windows import default_stft_window
from ..utils import round_up_to

_EPS = 1e-12


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _nmf_core(v, w0, h0, *, n_iter):
    prec = jax.lax.Precision.HIGHEST
    eps = jnp.float32(_EPS)
    ones_f = jnp.ones((v.shape[0], 1), jnp.float32)
    ones_t = jnp.ones((1, v.shape[1]), jnp.float32)

    def mm(a, b):
        return jnp.dot(a, b, precision=prec,
                       preferred_element_type=jnp.float32)

    def step(_, wh):
        w, h = wh
        r = v / (mm(w, h) + eps)
        h = h * mm(w.T, r) / (mm(w.T, ones_f) @ ones_t + eps)
        r = v / (mm(w, h) + eps)
        w = w * mm(r, h.T) / (ones_f @ mm(ones_t, h.T) + eps)
        return w, h

    return jax.lax.fori_loop(0, n_iter, step, (w0, h0))


def kl_divergence(v, w, h):
    """D_KL(V || WH) with the 0*log0 = 0 convention (host, f64)."""
    v = np.asarray(v, np.float64)
    wh = np.asarray(w, np.float64) @ np.asarray(h, np.float64) + _EPS
    lg = np.where(v > 0, np.log(np.maximum(v, _EPS) / wh), 0.0)
    return float((v * lg - v + wh).sum())


def nmf(v, n_components: int, *, n_iter: int = 200, seed: int = 0):
    """Factor a nonnegative (F, T) matrix: returns (W (F, K), H (K, T)).

    Deterministic mean-scaled uniform init from ``seed``; ``n_iter``
    KL multiplicative updates on device.  Columns of W are the learned
    spectral templates, rows of H their time activations.
    """
    v = np.asarray(v, np.float32)
    if v.ndim != 2:
        raise ValueError(f"v must be 2-D (n_freq, n_frames), got {v.shape}")
    if v.size == 0:
        raise ValueError(f"v is empty: {v.shape}")
    if (v < 0).any():
        raise ValueError("v must be nonnegative")
    k = int(n_components)
    if not 1 <= k <= min(v.shape):
        raise ValueError(
            f"n_components must be in [1, min(F, T)={min(v.shape)}], "
            f"got {n_components}"
        )
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    rng = np.random.default_rng(seed)
    scale = np.sqrt(max(v.mean(), _EPS) / k)
    w0 = (scale * (0.1 + rng.random((v.shape[0], k)))).astype(np.float32)
    h0 = (scale * (0.1 + rng.random((k, v.shape[1])))).astype(np.float32)
    w, h = _nmf_core(jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0),
                     n_iter=int(n_iter))
    return np.asarray(w), np.asarray(h)


@functools.partial(
    jax.jit,
    static_argnames=("win", "hop", "n_fft", "n_frames", "n_iter", "k"),
)
def _separate_core(padded, w0, h0, c, s, syn, idx, wsq, n_valid, *,
                   win, hop, n_fft, n_frames, n_iter, k):
    """STFT -> NMF on |X| -> per-component Wiener masks -> K masked
    inverse STFTs, all one program.  Pad rows (>= n_valid) are zeroed
    exactly like ops/hpss.py: their OLA mass has no matching window
    energy in the true-frames normalizer."""
    prec = jax.lax.Precision.HIGHEST
    pl, _ = n_pad_split(n_fft, win)
    total = (n_frames - 1) * hop + win

    frames = frame_device(padded, win, hop, n_frames)
    re = jnp.dot(frames, c, precision=prec,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec,
                 preferred_element_type=jnp.float32)
    rowmask = (jnp.arange(n_frames)[:, None] < n_valid).astype(jnp.float32)
    re = re * rowmask
    im = im * rowmask
    mag = jnp.sqrt(re * re + im * im)

    w, h = _nmf_core(mag.T, w0, h0, n_iter=n_iter)  # V is (F, T)
    wh = jnp.dot(w, h, precision=prec,
                 preferred_element_type=jnp.float32) + jnp.float32(_EPS)

    def istft_masked(kk):
        m = (w[:, kk:kk + 1] * h[kk:kk + 1, :] / wh).T  # (T, F)
        fr = inverse_rdft((re * m, im * m), n_fft)[:, pl:pl + win]
        sig = jnp.zeros(total, jnp.float32).at[idx].add(
            (fr * syn[None, :]).ravel()
        )
        return sig / wsq

    return jnp.stack([istft_masked(kk) for kk in range(k)]), w, h


def separate(
    wav,
    win_length: int,
    hop_length: int,
    n_fft: int,
    *,
    n_components: int = 4,
    n_iter: int = 200,
    seed: int = 0,
    window=None,
):
    """Split ``wav`` into ``n_components`` source estimates.

    Returns ``(parts, w, h)``: parts (K, len(wav)) float32 whose sum
    reconstructs the input to OLA rounding (the Wiener masks sum to 1
    pointwise), W (n_freq, K) spectral templates, H (K, n_frames)
    activations.  STFT conventions match :func:`perform_stft`
    (centered, reflect pad; ``window`` defaults to the session's
    hann/n_fft — its scale cancels through the masked roundtrip).
    """
    wav = np.asarray(wav, np.float32)
    if wav.ndim != 1:
        raise ValueError(f"wav must be 1-D, got {wav.shape}")
    half = win_length // 2
    if len(wav) < half + 1:
        raise ValueError(
            f"signal too short for win_length={win_length}: need at "
            f"least {half + 1} samples, got {len(wav)}"
        )
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if window is None:
        window = default_stft_window(win_length, n_fft)
    window = np.ascontiguousarray(window, dtype=np.float32)
    c, s = windowed_dft_matrices(window, n_fft)

    from .framing import n_frames_for, reflect_pad_center

    n_freq = n_fft // 2 + 1
    n_frames = n_frames_for(len(wav), win_length, hop_length)
    k = int(n_components)
    if not 1 <= k <= min(n_freq, n_frames):
        raise ValueError(
            f"n_components must be in [1, min(n_freq={n_freq}, "
            f"n_frames={n_frames})], got {n_components}"
        )
    n_pad = round_up_to(n_frames, 128)  # bounded jit cache (repo conv.)
    need = (n_pad - 1) * hop_length + win_length
    padded = np.pad(
        reflect_pad_center(wav, win_length),
        (0, max(0, need - (len(wav) + 2 * half))),
    )[:need]
    idx, _, total_pad = _ola_constants(n_pad, win_length, hop_length,
                                       window)
    _, wsq, total_true = _ola_constants(n_frames, win_length, hop_length,
                                        window)
    wsq = np.pad(wsq, (0, total_pad - total_true),
                 constant_values=np.float32(1e-24))
    rng = np.random.default_rng(seed)
    # scale-free init (actual mag scale multiplies in within a few
    # iterations; 0.1 floor keeps no entry at a multiplicative zero)
    w0 = (0.1 + rng.random((n_freq, k))).astype(np.float32)
    h0 = (0.1 + rng.random((k, n_pad))).astype(np.float32)
    parts, w, h = _separate_core(
        jnp.asarray(padded), jnp.asarray(w0), jnp.asarray(h0),
        jnp.asarray(c), jnp.asarray(s), jnp.asarray(window),
        jnp.asarray(idx), jnp.asarray(wsq), jnp.int32(n_frames),
        win=win_length, hop=hop_length, n_fft=n_fft, n_frames=n_pad,
        n_iter=int(n_iter), k=k,
    )
    parts = np.asarray(parts)[:, half:half + len(wav)]
    return parts, np.asarray(w), np.asarray(h)[:, :n_frames]
