"""Lanczos3 resize with image-rs parity (reference: display.rs:56-61).

The reference resizes the cached grey image with Rust's ``image`` crate
(``imageops::resize``, FilterType::Lanczos3).  That implementation is a
separable resample: vertical pass to the new height, then horizontal pass to
the new width, each clamping to the channel range ([0, 1] for f32 Luma).
Per output pixel it computes a normalized window of kernel weights:

    ratio   = in / out;  sratio = max(ratio, 1);  support = 3 * sratio
    center  = (o + 0.5) * ratio
    left    = clamp(floor(center - support), 0, in - 1)
    right   = clamp(ceil (center + support), left + 1, in)
    w_i     = lanczos3((i - (center - 0.5)) / sratio),  normalized to sum 1

On TPU this is two GEMMs: precomputed host-side weight matrices hit the MXU,
and the in-between clamps are fused elementwise ops.  For very wide inputs
(hour-long spectrograms) the dense horizontal matrix would be huge, so the
device also has a banded path: per-output-pixel gather windows applied in
chunks with einsum (SURVEY.md §7 hard part "Lanczos3 resize parity").
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

SUPPORT = 3.0  # lanczos3 filter support in image-rs
# Use a dense weight matrix only for modest sizes: beyond this, the dense
# matrix costs O(in*out) host build + host->device transfer per zoom level
# (~150 MB at 6k x 6k — measured 3.7 s/render over the axon tunnel), while
# the banded form is O(out * band) (~200 KB) with identical output.
DENSE_LIMIT = 2048


def _sinc_f32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    a = x * np.float32(np.pi)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.sin(a, dtype=np.float32) / a
    return np.where(x == 0, np.float32(1.0), out).astype(np.float32)


def _lanczos3_kernel_f32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float32)
    inside = np.abs(x) < np.float32(SUPPORT)
    return np.where(
        inside, _sinc_f32(x) * _sinc_f32(x / np.float32(SUPPORT)), np.float32(0.0)
    ).astype(np.float32)


@functools.lru_cache(maxsize=256)
def resize_weights(in_size: int, out_size: int):
    """Banded resample weights, f32, replicating image-rs ``*_sample``.

    Returns (left, w): left (out_size,) int32 window starts and
    w (out_size, M) float32 normalized weights (zero beyond each window).
    """
    f32 = np.float32
    ratio = f32(in_size) / f32(out_size)
    sratio = max(ratio, f32(1.0))
    src_support = f32(SUPPORT) * sratio

    o = np.arange(out_size, dtype=np.float32)
    inputx = (o + f32(0.5)) * ratio  # f32, matching image-rs exactly
    left = np.clip(np.floor(inputx - src_support).astype(np.int64), 0, in_size - 1)
    right = np.clip(np.ceil(inputx + src_support).astype(np.int64), left + 1, in_size)
    center = inputx - f32(0.5)

    m_max = int((right - left).max())
    i = left[:, None] + np.arange(m_max)[None, :]
    valid = i < right[:, None]
    x = (i.astype(np.float32) - center[:, None]) / sratio
    w = np.where(valid, _lanczos3_kernel_f32(x), f32(0.0))
    # image-rs normalizes by the (pre-normalization) window sum, accumulated
    # SEQUENTIALLY in f32 (`sum += w` in *_sample).  cumsum reproduces that
    # order; unlike np.sum's pairwise grouping it is also independent of the
    # row padding width, which makes resize_weights_range bit-identical to
    # the corresponding rows here (trailing +0.0 terms are exact no-ops).
    norm = np.cumsum(w, axis=1, dtype=np.float32)[:, -1:]
    w = (w / norm).astype(np.float32)
    w = np.where(valid, w, f32(0.0))
    return left.astype(np.int32), w


def resize_weights_range(in_size: int, out_size: int, c0: int, c1: int):
    """Banded weights for output columns [c0, c1) ONLY — the same rows
    ``resize_weights(in_size, out_size)`` would produce (zero-pad width
    aside), built in O((c1-c0) * band) instead of O(out_size * band).

    This keeps viewport crop renders O(viewport) when the full logical
    width is enormous (hour-scale tracks at deep zoom: full widths in the
    1e6..1e9 column range must never be materialized host-side).
    """
    f32 = np.float32
    ratio = f32(in_size) / f32(out_size)
    sratio = max(ratio, f32(1.0))
    src_support = f32(SUPPORT) * sratio

    # same value stream as resize_weights' arange(out_size)[c0:c1] — exact
    # f32 ints below 2^24 and identically rounded above
    o = np.arange(c0, c1, dtype=np.int64).astype(np.float32)
    inputx = (o + f32(0.5)) * ratio
    left = np.clip(np.floor(inputx - src_support).astype(np.int64), 0, in_size - 1)
    right = np.clip(np.ceil(inputx + src_support).astype(np.int64), left + 1, in_size)
    center = inputx - f32(0.5)

    m_max = int((right - left).max())
    i = left[:, None] + np.arange(m_max)[None, :]
    valid = i < right[:, None]
    x = (i.astype(np.float32) - center[:, None]) / sratio
    w = np.where(valid, _lanczos3_kernel_f32(x), f32(0.0))
    # sequential f32 sum — see the note in resize_weights
    norm = np.cumsum(w, axis=1, dtype=np.float32)[:, -1:]
    w = (w / norm).astype(np.float32)
    w = np.where(valid, w, f32(0.0))
    return left.astype(np.int32), w


@functools.lru_cache(maxsize=256)
def resize_weights_dense(in_size: int, out_size: int) -> np.ndarray:
    """Dense (out_size, in_size) f32 weight matrix (for MXU-friendly sizes)."""
    left, w = resize_weights(in_size, out_size)
    dense = np.zeros((out_size, in_size), dtype=np.float32)
    m = w.shape[1]
    cols = np.clip(left[:, None] + np.arange(m)[None, :], 0, in_size - 1)
    np.add.at(dense, (np.arange(out_size)[:, None], cols), w)
    return dense


def _apply_banded_cols(x, left, w, chunk: int = 512):
    """Resample the LAST axis of x (…, in) -> (…, out) using banded weights.

    Chunked over output columns with lax.map to bound gather memory at
    (…, chunk, M) — needed for hour-scale spectrogram widths.
    """
    out_size, m = w.shape
    pad_out = (-out_size) % chunk
    left_p = jnp.pad(left, (0, pad_out))
    w_p = jnp.pad(w, ((0, pad_out), (0, 0)))
    n_chunks = (out_size + pad_out) // chunk
    idx = jnp.clip(
        left_p[:, None] + jnp.arange(m, dtype=jnp.int32)[None, :], 0, x.shape[-1] - 1
    )
    idx = idx.reshape(n_chunks, chunk, m)
    w_r = w_p.reshape(n_chunks, chunk, m)

    def body(args):
        idx_c, w_c = args  # (chunk, M)
        g = jnp.take(x, idx_c, axis=-1)  # (…, chunk, M)
        return jnp.einsum("...cm,cm->...c", g, w_c)

    out = jax.lax.map(body, (idx, w_r))  # (n_chunks, …, chunk)
    out = jnp.moveaxis(out, 0, -2).reshape(x.shape[:-1] + (n_chunks * chunk,))
    return out[..., :out_size]


def lanczos3_resize(grey, out_h: int, out_w: int, in_h=None, in_w=None):
    """image-rs-parity Lanczos3 resize of a (H, W) f32 grey image.

    ``in_h``/``in_w`` override the *logical* input size when the stored array
    is shape-bucketed with zero padding (extra rows/cols are never read
    because the weight windows are built from the logical size).
    Vertical pass first, then horizontal, clamping to [0, 1] after each pass
    exactly like the f32 Luma channel clamp in image-rs.
    """
    h, w_total = grey.shape
    in_h = in_h or h
    in_w = in_w or w_total

    wv = jnp.asarray(resize_weights_dense(in_h, out_h))  # (out_h, in_h)
    x = grey[:in_h] if in_h != h else grey
    x = jnp.clip(
        jnp.dot(wv, x, precision=jax.lax.Precision.HIGHEST), 0.0, 1.0
    )  # (out_h, W)

    if in_w <= DENSE_LIMIT and out_w <= DENSE_LIMIT:
        wh = jnp.asarray(resize_weights_dense(in_w, out_w))  # (out_w, in_w)
        x = x[:, :in_w] if in_w != w_total else x
        y = jnp.dot(x, wh.T, precision=jax.lax.Precision.HIGHEST)
    else:
        left, wb = resize_weights(in_w, out_w)
        x = x[:, :in_w] if in_w != w_total else x
        y = _apply_banded_cols(x, jnp.asarray(left), jnp.asarray(wb))
    return jnp.clip(y, 0.0, 1.0)
