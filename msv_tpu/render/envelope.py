"""Min/max-envelope waveform renderer (reference: wav_to_image,
display.rs:63-115).

Per output column i the reference takes min/max over samples in
[rust_round((i-1.5)*spp), rust_round((i+1.5)*spp)) where spp = len/nwidth,
paints a >= 3 px thick column of WAVECOLOR, and, when zoomed past
1 sample/px (spp < 1), first linearly upsamples by ceil(1/spp)
(display.rs:76-91 — including its quirk of indexing the upsampled buffer
with ORIGINAL-scale sample offsets; replicated bit-for-bit below).

TPU design: column windows are host-precomputed (start, end) int arrays; the
device reduces min/max on the VPU and rasterizes the column mask with
broadcasted iota — no per-column host loop.  Two reduction strategies:

  * direct: gather each column's window (chunked with lax.map to bound
    memory) — used when windows are narrow (deep zoom).
  * pooled: precompute block min/max (block B=1024 via reshape-reduce), then
    each column combines its fully-covered blocks plus two raw edge windows
    of < B samples.  Exact (no approximation) and keeps hour-scale
    zoomed-out renders at O(len/B) gathered elements.

Documented deviations from the reference (robustness fixes, see tests):
  * empty windows (very deep zoom) would panic in Rust via
    ``wav_slice.max().unwrap()``; we clamp end >= start+1.
  * a sample equal to amp_min maps to row nheight and Rust's
    ``slice_mut(s![top..bottom+1])`` would panic; we clamp bottom to
    nheight-1.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import next_pow2, round_up_to
from ..utils.rounding import rust_round_np
from .colormap import WAVECOLOR

_COL_BUCKET = 512
_CHUNK = 512
_BLOCK = 1024  # pooled-reduction block size
_DIRECT_LIMIT = 4096  # use direct gather when max window <= this
_WAV_BUCKET = 1 << 16
# Full-width column-window arrays are cached up to this many columns; any
# wider render computes its viewport's windows directly in O(viewport).
_COLW_FULL_LIMIT = 1 << 20
_FORCE_MODE = None  # test hook: "sparse" / "direct" pins the minmax path


def column_windows(i_px: np.ndarray, nwidth: int, n: int, buf_len: int):
    """±1.5·spp column windows (display.rs:92-97 semantics): window i
    spans [round((i-1.5)·spp), round((i+1.5)·spp)) clamped to
    [0, buf_len), rust round-half-away on f32 products.

    THE single source of the window math — EnvelopeState (full-width and
    viewport builds) and the sequence-sharded reducer
    (parallel/sharded.py::sharded_envelope_minmax) both call it, so
    their bit-for-bit parity cannot silently drift (review finding)."""
    f32 = np.float32
    samples_per_px = f32(n) / f32(nwidth)
    starts = rust_round_np((i_px - f32(1.5)) * samples_per_px)
    starts = np.maximum(starts, 0.0).astype(np.int64)
    ends = rust_round_np((i_px + f32(1.5)) * samples_per_px).astype(np.int64)
    ends = np.minimum(ends, buf_len)
    ends = np.maximum(ends, starts + 1)  # deviation: no empty-window panic
    return starts, ends


def _upsample_reference_quirk(wav: np.ndarray, factor: int) -> np.ndarray:
    """Linear upsample exactly like display.rs:76-91 (f32):
    out[i] = b * (i%f)/f + wav[i//f] * (1 - (i%f)/f),
    b = wav[i//f + 1] if in range else 0."""
    f32 = np.float32
    n = len(wav)
    i = np.arange(n * factor)
    j = i // factor
    r = (i % factor).astype(np.float32) / f32(factor)
    b = np.where(j + 1 < n, wav[np.minimum(j + 1, n - 1)], f32(0.0))
    return (b * r + wav[j] * (f32(1.0) - r)).astype(np.float32)


def _upsample_quirk_range(state, factor: int, s0: int, e1: int) -> np.ndarray:
    """Viewport-local form of :func:`_upsample_reference_quirk`: the
    upsampled-buffer values for indices [s0, e1) only, reading just the
    source samples those indices touch.  Elementwise-identical to slicing
    the full upsampled buffer (same f32 ops on the same values)."""
    f32 = np.float32
    n = state.n
    j0 = s0 // factor
    j1 = (e1 - 1) // factor
    wav = state.host_f32_range(j0, min(j1 + 2, n))
    i = np.arange(s0, e1)
    j = i // factor
    r = (i % factor).astype(np.float32) / f32(factor)
    jj = j - j0
    b = np.where(j + 1 < n, wav[np.minimum(jj + 1, len(wav) - 1)], f32(0.0))
    return (b * r + wav[jj] * (f32(1.0) - r)).astype(np.float32)


def _sparse_query(lvl_max, lvl_min, pmx, pmn, starts, ends, k):
    """The 8-gather sparse-table lookup over prebuilt levels (level k in
    lvl_*, level k-1 in pm*)."""
    nbuf = pmx.shape[0]
    lens = ends - starts
    sel = (lens < (jnp.int32(1) << k)) & (k > 0)  # use level k-1
    w = jnp.int32(1) << jnp.where(sel, k - 1, k)
    lo = jnp.clip(starts, 0, nbuf - 1)
    hi = jnp.clip(ends - w, 0, nbuf - 1)
    a_max = jnp.where(sel, pmx[lo], lvl_max[lo])
    b_max = jnp.where(sel, pmx[hi], lvl_max[hi])
    a_min = jnp.where(sel, pmn[lo], lvl_min[lo])
    b_min = jnp.where(sel, pmn[hi], lvl_min[hi])
    return jnp.maximum(a_max, b_max), jnp.minimum(a_min, b_min)


@functools.partial(jax.jit, static_argnames=("pad",))
def _build_sparse_levels(wav, scale, k, *, pad):
    """Build the two sparse-table levels (k and k-1) for ``wav`` — the
    doubling min/max passes of :func:`_sparse_window_minmax`, split out so
    EnvelopeState can cache the result per (k, pad): the build streams the
    whole buffer ~2k times, while a cached re-render needs only the 8
    gathers per column (docs/STATUS.md r2 known gap)."""
    if wav.dtype in (jnp.int16, jnp.int32):
        wav = wav.astype(jnp.float32) * jnp.float32(scale)
    nbuf = wav.shape[0]
    neg = jnp.full((pad,), -jnp.inf, wav.dtype)
    pos = jnp.full((pad,), jnp.inf, wav.dtype)
    mx0 = jnp.concatenate([wav, neg])
    mn0 = jnp.concatenate([wav, pos])

    def step(j, carry):
        mx, mn, pmx, pmn = carry
        save = j == k - 1
        pmx = jnp.where(save, mx[:nbuf], pmx)
        pmn = jnp.where(save, mn[:nbuf], pmn)
        sh = jnp.int32(1) << j
        mx_s = jax.lax.dynamic_slice(mx, (sh,), (nbuf,))
        mn_s = jax.lax.dynamic_slice(mn, (sh,), (nbuf,))
        mx = mx.at[:nbuf].set(jnp.maximum(mx[:nbuf], mx_s))
        mn = mn.at[:nbuf].set(jnp.minimum(mn[:nbuf], mn_s))
        return mx, mn, pmx, pmn

    mx, mn, pmx, pmn = jax.lax.fori_loop(0, k, step, (mx0, mn0, wav, wav))
    return mx[:nbuf], mn[:nbuf], pmx, pmn


def _sparse_window_minmax(wav, starts, ends, k, n_cols, pad):
    """Sparse-table path: exact per-column (max, min) via two overlapping
    power-of-two windows (classic RMQ).

    TPU gathers run ~10-30x slower per element than streaming reads, so
    the direct path's ``n_cols * m`` gather (e.g. 277M elements for a
    360k-column render of a 30-min track) is the wall — measured 36 s
    warm.  Here the level-j sliding min/max (``lvl_j[i] = min/max of
    wav[i : i+2^j]``) is built with j doubling steps of PAIRWISE
    elementwise min/max — no gathers, pure VPU streaming — and each
    column then needs only 2 gathers per stat:

        window [s, e) with 2^j <= e-s <= 2^(j+1)
        max = max(lvl_j_max[s], lvl_j_max[e - 2^j])

    TWO levels (k and k-1) are kept because a render's windows span up to
    a 4x length range: interior columns are ~3*spp wide but the first and
    last are clipped to ~1.5*spp (col_windows clamps to the file).  Each
    column picks its level by length.  The caller guarantees every real
    column has 2^(k-1) <= len <= 2^(k+1); padded dummy columns read
    clipped junk that is discarded host-side.

    ``k`` is TRACED (lax.fori_loop with dynamic-slice shifts), so every
    zoom level shares one compiled program per shape bucket — the same
    cache discipline as the rest of the codebase (CLAUDE.md).
    """
    nbuf = wav.shape[0]
    # ``pad`` (static, >= max window, power-of-two bucketed by the caller)
    # bounds every traced shift: 2^(k-1) <= max_win <= pad.  A small tail,
    # not a doubled buffer — the transient must not scale with the track.
    neg = jnp.full((pad,), -jnp.inf, wav.dtype)
    pos = jnp.full((pad,), jnp.inf, wav.dtype)
    mx0 = jnp.concatenate([wav, neg])
    mn0 = jnp.concatenate([wav, pos])

    def step(j, carry):
        mx, mn, pmx, pmn = carry
        save = j == k - 1  # snapshot level k-1 for the short columns
        pmx = jnp.where(save, mx[:nbuf], pmx)
        pmn = jnp.where(save, mn[:nbuf], pmn)
        sh = jnp.int32(1) << j
        mx_s = jax.lax.dynamic_slice(mx, (sh,), (nbuf,))
        mn_s = jax.lax.dynamic_slice(mn, (sh,), (nbuf,))
        mx = mx.at[:nbuf].set(jnp.maximum(mx[:nbuf], mx_s))
        mn = mn.at[:nbuf].set(jnp.minimum(mn[:nbuf], mn_s))
        return mx, mn, pmx, pmn

    mx, mn, pmx, pmn = jax.lax.fori_loop(
        0, k, step, (mx0, mn0, wav, wav)
    )
    return _sparse_query(mx[:nbuf], mn[:nbuf], pmx, pmn, starts, ends, k)


def _chunked_window_minmax(wav, starts, ends, m, n_cols):
    """Direct path: per-column (max, min) over [starts, ends), windows <= m."""
    n_chunks = n_cols // _CHUNK
    offs = jnp.arange(m, dtype=jnp.int32)[None, :]
    idx_all = starts[:, None] + offs
    valid_all = idx_all < ends[:, None]
    idx_all = jnp.clip(idx_all, 0, wav.shape[0] - 1)
    idx_all = idx_all.reshape(n_chunks, _CHUNK, m)
    valid_all = valid_all.reshape(n_chunks, _CHUNK, m)

    def body(args):
        idx_c, valid_c = args
        g = wav[idx_c]
        return (
            jnp.max(jnp.where(valid_c, g, -jnp.inf), axis=1),
            jnp.min(jnp.where(valid_c, g, jnp.inf), axis=1),
        )

    mx, mn = jax.lax.map(body, (idx_all, valid_all))
    return mx.reshape(n_cols), mn.reshape(n_cols)


@jax.jit
def _block_minmax(wav, scale=2.0**-15):
    """Per-block min/max pyramid level (zoom-invariant; cached per track).

    ``scale`` (traced) is the integer-carrier unit for int16/int32 input
    (see io/audio.py open_audio_mono_ex); ignored for f32.
    """
    if wav.dtype in (jnp.int16, jnp.int32):
        wav = wav.astype(jnp.float32) * jnp.float32(scale)
    nb = wav.shape[0] // _BLOCK
    blocks = wav[: nb * _BLOCK].reshape(nb, _BLOCK)
    return jnp.max(blocks, axis=1), jnp.min(blocks, axis=1)


class EnvelopeState:
    """Device-resident waveform + min/max pyramid for repeated envelope
    renders of one track (zoom / amp changes re-ship only index arrays,
    not the waveform — at hour scale the wav transfer alone was ~10 s).

    ``wav_f32``: host f32 signal (kept for the deep-zoom upsample branch);
    ``transfer_i16``: optional integer-carrier form (int16/int32) used as
    the narrow device transfer format; ``scale`` is its unit (values are
    identical after the exact on-device power-of-two scale).
    """

    def __init__(self, wav_f32, transfer_i16=None, n: int | None = None,
                 scale: float = 2.0**-15):
        # ``wav_f32`` may be None for integer sources: the host f32 copy is
        # only needed by the rare deep-zoom upsample branch, and at hour
        # scale it is ~700 MB — materialize lazily via the property.
        self._wav_np = (
            np.ascontiguousarray(wav_f32, dtype=np.float32)
            if wav_f32 is not None
            else None
        )
        self._src_int = transfer_i16
        self.scale = float(scale)
        if self._wav_np is None and transfer_i16 is None:
            raise ValueError("EnvelopeState needs wav_f32 or transfer_i16")
        self.n = n if n is not None else len(
            transfer_i16 if transfer_i16 is not None else self._wav_np
        )
        src = transfer_i16 if transfer_i16 is not None else self._wav_np
        pad = round_up_to(max(self.n, _WAV_BUCKET), _WAV_BUCKET) - self.n
        self.dev = jnp.asarray(np.pad(np.ascontiguousarray(src), (0, pad)))
        self.offset = 0  # device-buffer index of the file's sample 0
        self._init_caches()

    def _init_caches(self):
        import collections
        import threading

        self._pooled = None
        self._col_cache = collections.OrderedDict()
        self._sparse_cache = collections.OrderedDict()  # (k, pad) -> levels
        self._dev_col_cache = collections.OrderedDict()  # key -> dev arrays
        # guards the LRUs + lazy pyramid + lazy host f32 under concurrent
        # viewer renders
        self._cache_lock = threading.Lock()

    @property
    def wav_np(self) -> np.ndarray:
        if self._wav_np is None:
            with self._cache_lock:
                if self._wav_np is None:
                    self._wav_np = self._src_int.astype(
                        np.float32
                    ) * np.float32(self.scale)
        return self._wav_np

    @classmethod
    def from_device(cls, dev, n: int, offset: int, src_int=None,
                    src_f32=None, scale: float = 2.0**-15):
        """Adopt an already-device-resident buffer (e.g. the streamed,
        reflect-padded waveform from streaming_spec_db(keep_wav=True),
        whose sample 0 sits at ``offset``) — the envelope then costs no
        second whole-file transfer.  ``src_int`` (integer carriers) or
        ``src_f32`` (true-float sources) feeds the host-f32 view for the
        deep-zoom upsample branch."""
        if src_int is None and src_f32 is None:
            raise ValueError("from_device needs src_int or src_f32")
        self = cls.__new__(cls)
        self._wav_np = (
            np.ascontiguousarray(src_f32, dtype=np.float32)
            if src_f32 is not None
            else None
        )
        self._src_int = src_int
        self.scale = float(scale)
        self.n = n
        self.dev = dev
        self.offset = int(offset)
        self._init_caches()
        return self

    def device_nbytes(self) -> int:
        """Current device footprint: the resident waveform plus every
        cached sparse-table level and column-index array (session HBM
        budget accounting)."""
        with self._cache_lock:
            total = int(self.dev.nbytes)
            for levels in self._sparse_cache.values():
                for arr in levels:
                    total += int(getattr(arr, "nbytes", 0))
            for pair in self._dev_col_cache.values():
                for arr in pair:
                    total += int(getattr(arr, "nbytes", 0))
            if self._pooled is not None:
                for arr in self._pooled:
                    total += int(getattr(arr, "nbytes", 0))
        return total

    def pooled(self):
        with self._cache_lock:
            if self._pooled is None:
                self._pooled = _block_minmax(self.dev, self.scale)
            return self._pooled

    def sparse_levels(self, k: int, pad: int):
        """Device-cached sparse-table levels for this track's buffer
        (VERDICT r2 #5: the per-render build streamed the whole buffer
        ~2k times; re-renders now pay only the 8 gathers per column).
        Returns (bmax (2, nbuf), bmin (2, nbuf)) stacks of (level-k,
        level-(k-1)) max/min tables.  LRU of 2: a user bounces between a
        couple of zoom levels, and each level set costs 16 bytes/sample."""
        key = (int(k), int(pad))
        with self._cache_lock:
            hit = self._sparse_cache.get(key)
            if hit is not None:
                self._sparse_cache.move_to_end(key)
                return hit
        lmax, lmin, pmx, pmn = _build_sparse_levels(
            self.dev, jnp.float32(self.scale), jnp.int32(k), pad=int(pad)
        )
        packed = (jnp.stack([lmax, pmx]), jnp.stack([lmin, pmn]))
        with self._cache_lock:
            self._sparse_cache[key] = packed
            while len(self._sparse_cache) > 2:
                self._sparse_cache.popitem(last=False)
        return packed

    def dev_cols(self, key, starts_p, ends_p):
        """Device-resident column-window arrays, cached per render
        geometry: a same-zoom re-render (e.g. an amp change) then uploads
        only scalars instead of the 8-bytes-per-column index arrays."""
        with self._cache_lock:
            hit = self._dev_col_cache.get(key)
            if hit is not None:
                self._dev_col_cache.move_to_end(key)
                return hit
        dev_pair = (jnp.asarray(starts_p), jnp.asarray(ends_p))
        with self._cache_lock:
            self._dev_col_cache[key] = dev_pair
            while len(self._dev_col_cache) > 8:
                self._dev_col_cache.popitem(last=False)
        return dev_pair

    def _windows_for(self, i_px: np.ndarray, nwidth: int, buf_len: int):
        """±1.5·spp column windows (display.rs:92-97 semantics) for the
        given f32 column indices.  Shared by the cached full-width build
        and the O(viewport) range build — identical f32 value streams."""
        return column_windows(i_px, nwidth, self.n, buf_len)

    def col_windows(self, nwidth: int, buf_len: int):
        """Full-width per-column sample windows for one zoom level,
        cached (VERDICT r1 #8: rebuilding the ±1.5·spp index arrays cost
        ~0.2 s per wide render at hour scale).  Any viewport crop is a
        cheap slice of the full-width arrays.  Small LRU: a user bounces
        between a handful of zoom levels."""
        key = (nwidth, buf_len)
        with self._cache_lock:
            hit = self._col_cache.get(key)
            if hit is not None:
                self._col_cache.move_to_end(key)
                return hit
        starts, ends = self._windows_for(
            np.arange(nwidth, dtype=np.float32), nwidth, buf_len
        )
        with self._cache_lock:
            self._col_cache[key] = (starts, ends)
            while len(self._col_cache) > 6:
                self._col_cache.popitem(last=False)
        return starts, ends

    def col_windows_range(self, nwidth: int, buf_len: int, c0: int, c1: int):
        """Windows for columns [c0, c1) only.  Uses the cached full-width
        arrays for moderate widths (pan reuse); above _COLW_FULL_LIMIT it
        computes the range directly so a viewport render of an extreme
        zoom level allocates O(viewport), never O(full width)."""
        if nwidth <= _COLW_FULL_LIMIT:
            starts, ends = self.col_windows(nwidth, buf_len)
            return starts[c0:c1], ends[c0:c1]
        # same value stream as arange(nwidth, f32)[c0:c1]: exact f32 ints
        # below 2^24, identically rounded above
        i_px = np.arange(c0, c1, dtype=np.int64).astype(np.float32)
        return self._windows_for(i_px, nwidth, buf_len)

    def host_f32_range(self, a: int, b: int) -> np.ndarray:
        """Host f32 mono samples [a, b) WITHOUT materializing the full
        track (the deep-zoom branch at hour scale would otherwise convert
        ~700 MB for a 1200-px viewport)."""
        if self._wav_np is not None:
            return self._wav_np[a:b]
        return self._src_int[a:b].astype(np.float32) * np.float32(self.scale)


def _pooled_window_minmax(wav, bmax, bmin, starts, ends, mp, n_cols):
    """Pooled path: block min/max + raw edges.  Exact for any window size."""
    nb = bmax.shape[0]

    s_blk = -(-starts // _BLOCK)  # ceil
    e_blk = ends // _BLOCK  # floor
    offs = jnp.arange(mp, dtype=jnp.int32)[None, :]

    n_chunks = n_cols // _CHUNK

    def reshape_c(x):
        return x.reshape(n_chunks, _CHUNK) if x.ndim == 1 else x.reshape(
            (n_chunks, _CHUNK) + x.shape[1:]
        )

    bidx = s_blk[:, None] + offs
    bvalid = bidx < e_blk[:, None]
    bidx = jnp.clip(bidx, 0, nb - 1)

    eoffs = jnp.arange(_BLOCK, dtype=jnp.int32)[None, :]
    # left edge: [start, min(s_blk*B, end));  right edge: [max(e_blk*B, start), end)
    le_start, le_end = starts, jnp.minimum(s_blk * _BLOCK, ends)
    re_start, re_end = jnp.maximum(e_blk * _BLOCK, starts), ends
    lidx = le_start[:, None] + eoffs
    lvalid = lidx < le_end[:, None]
    lidx = jnp.clip(lidx, 0, wav.shape[0] - 1)
    ridx = re_start[:, None] + eoffs
    rvalid = ridx < re_end[:, None]
    ridx = jnp.clip(ridx, 0, wav.shape[0] - 1)

    args = tuple(
        map(reshape_c, (bidx, bvalid, lidx, lvalid, ridx, rvalid))
    )

    def body(a):
        bidx_c, bvalid_c, lidx_c, lvalid_c, ridx_c, rvalid_c = a
        gb_max = jnp.where(bvalid_c, bmax[bidx_c], -jnp.inf)
        gb_min = jnp.where(bvalid_c, bmin[bidx_c], jnp.inf)
        gl = wav[lidx_c]
        gr = wav[ridx_c]
        mx = jnp.maximum(
            jnp.max(gb_max, axis=1),
            jnp.maximum(
                jnp.max(jnp.where(lvalid_c, gl, -jnp.inf), axis=1),
                jnp.max(jnp.where(rvalid_c, gr, -jnp.inf), axis=1),
            ),
        )
        mn = jnp.minimum(
            jnp.min(gb_min, axis=1),
            jnp.minimum(
                jnp.min(jnp.where(lvalid_c, gl, jnp.inf), axis=1),
                jnp.min(jnp.where(rvalid_c, gr, jnp.inf), axis=1),
            ),
        )
        return mx, mn

    mx, mn = jax.lax.map(body, args)
    return mx.reshape(n_cols), mn.reshape(n_cols)


@functools.partial(
    jax.jit, static_argnames=("m", "nheight", "n_cols", "mode")
)
def _envelope_core(
    wav, bmax, bmin, starts, ends, amp_min, amp_max, scale, k, *, m,
    nheight, n_cols, mode
):
    if mode == "sparse_pre":
        # prebuilt levels ride in through the bmax/bmin slots as (2, nbuf)
        # stacks; the waveform itself is never touched
        mx, mn = _sparse_query(
            bmax[0], bmin[0], bmax[1], bmin[1], starts, ends, k
        )
    else:
        if wav.dtype in (jnp.int16, jnp.int32):
            wav = wav.astype(jnp.float32) * jnp.float32(scale)
        if mode == "pooled":
            mx, mn = _pooled_window_minmax(
                wav, bmax, bmin, starts, ends, m, n_cols
            )
        elif mode == "sparse":
            mx, mn = _sparse_window_minmax(wav, starts, ends, k, n_cols, pad=m)
        else:
            mx, mn = _chunked_window_minmax(wav, starts, ends, m, n_cols)

    # amp -> row: rust_round((amp_max - x) * nheight / range) as isize.
    # The f32 association must be ((amp_max - x) * nheight) / range exactly
    # as display.rs:71-72 writes it — a precomputed nheight/range scale can
    # land on the other side of a .5 rounding tie and shift a column 1 px.
    def to_px(x):
        v = (amp_max - x) * jnp.float32(nheight) / (amp_max - amp_min)
        return jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5)).astype(
            jnp.int32
        )

    top = to_px(mx)
    bottom = to_px(mn)
    d = 3 - (bottom - top)
    pad_top = jnp.where(d > 0, d // 2, 0)  # floor(d/2)  (display.rs:102)
    pad_bottom = jnp.where(d > 0, (d + 1) // 2, 0)  # ceil(d/2)  (display.rs:101)
    top = jnp.maximum(top - pad_top, 0)
    bottom = jnp.clip(bottom + pad_bottom, None, nheight - 1)
    # the image IS (top, bottom): each column is a solid WAVECOLOR band
    # (display.rs:98-110), so only 8 bytes/column cross the device->host
    # wire and the paint runs on the host — nheight x cheaper than
    # shipping the (4, H, W) pixels over the ~20 MB/s relay.  The extra
    # clamps below cannot change the painted mask (rows>=top stays
    # equivalent for top in [-1, nheight], likewise bottom) but bound the
    # off-screen values of extreme amp zooms.  int32, not int16: the
    # library accepts any nheight, and int16 would wrap past 32767 rows
    # (ADVICE r2).
    top = jnp.clip(top, -1, nheight).astype(jnp.int32)
    bottom = jnp.clip(bottom, -1, nheight).astype(jnp.int32)
    return top, bottom


def wav_to_image(
    wav,
    nwidth: int,
    nheight: int,
    amp_range,
    state: EnvelopeState | None = None,
    col_range: tuple | None = None,
) -> np.ndarray:
    """Render the waveform envelope -> (nheight, nwidth, 4) RGBA u8.

    Pass a cached :class:`EnvelopeState` (the session keeps one per track)
    to avoid re-shipping the waveform on every zoom/amp change.
    ``col_range=(c0, c1)`` renders only those output columns of the
    full-width image (viewport crop; pixel-identical to slicing).
    """
    f32 = np.float32
    amp_min, amp_max = f32(amp_range[0]), f32(amp_range[1])
    if state is None:
        state = EnvelopeState(np.ascontiguousarray(wav, dtype=np.float32))
    n = state.n
    if nwidth <= 0 or nheight <= 0:
        return np.zeros((max(nheight, 0), max(nwidth, 0), 4), dtype=np.uint8)

    samples_per_px = f32(n) / f32(nwidth)
    offset = state.offset

    c0, c1 = (0, nwidth) if col_range is None else col_range
    c0, c1 = max(0, int(c0)), min(nwidth, int(c1))
    out_cols = max(c1 - c0, 0)
    if out_cols == 0:
        return np.zeros((nheight, 0, 4), dtype=np.uint8)

    if samples_per_px < 1.0:
        # deep zoom: render from the quirky upsampled buffer
        factor = int(np.ceil(f32(1.0) / samples_per_px))
        buf_len = n * factor  # logical upsampled length (windows clip here)
        starts, ends = state.col_windows_range(nwidth, buf_len, c0, c1)
        if col_range is None:
            # full-width deep zoom of a short track: small ephemeral buffer
            buf_np = _upsample_reference_quirk(state.wav_np, factor)
            offset = 0
        else:
            # viewport-local: upsample ONLY the sample range the windows
            # [s0, e1) read — O(viewport) work and allocation even for
            # hour-scale tracks, and no full-track f32 materialization
            # for integer carriers (VERDICT r2 #3)
            s0, e1 = int(starts[0]), int(ends[-1])
            buf_np = _upsample_quirk_range(state, factor, s0, e1)
            offset = -s0
        blen = len(buf_np)
        pad_len = round_up_to(max(blen, _WAV_BUCKET), _WAV_BUCKET) - blen
        dev = jnp.asarray(np.pad(buf_np, (0, pad_len)))
    else:
        buf_len = n
        dev = state.dev
        starts, ends = state.col_windows_range(nwidth, buf_len, c0, c1)

    n_cols = round_up_to(out_cols, _COL_BUCKET)
    starts_p = np.zeros(n_cols, dtype=np.int32)
    ends_p = np.zeros(n_cols, dtype=np.int32)
    # `offset` shifts file-coordinate windows into device-buffer
    # coordinates (nonzero when the buffer is the reflect-padded waveform
    # adopted from the streaming pipeline)
    starts_p[:out_cols] = starts + offset
    ends_p[:out_cols] = ends + offset
    ends_p[out_cols:] = 1  # dummy non-empty windows for the padded tail

    lens = ends - starts
    max_win = int(lens.max())
    min_win = int(lens.min())
    # sparse-table eligibility: smallest k with 2^(k+1) >= max_win; the
    # two kept levels then cover lengths in [2^(k-1), 2^(k+1)] — true for
    # any single render (interior ~3*spp, clipped edges >= ~1.5*spp)
    k_sparse = max((max_win - 1).bit_length() - 1, 0)
    sparse_ok = min_win >= (1 << k_sparse) // 2 and min_win >= 1
    # cost: direct gathers n_cols*m elements; the sparse build streams
    # ~4k passes over the buffer and then gathers 8 per column
    m_direct = int(round_up_to(max(max_win, 1), 128))
    # sparse only in the small-window / many-column regime it was built
    # for (the 360k-col 36-s gather case): its per-render build streams
    # the WHOLE buffer, so for max_win > _DIRECT_LIMIT the pooled path's
    # per-track CACHED pyramid stays the cheaper engine (hour-scale
    # zoom-outs would otherwise rebuild multi-GB levels per pan/zoom)
    use_sparse = (
        sparse_ok
        and max_win <= _DIRECT_LIMIT
        and n_cols * m_direct > dev.shape[0]
    )
    if _FORCE_MODE is not None:  # test hook: pin one path for A/B parity
        use_sparse = (_FORCE_MODE == "sparse" and sparse_ok
                      and max_win <= _DIRECT_LIMIT)
    k = 0
    if use_sparse:
        # static build pad >= max window; power-of-two bucketed so zoom
        # levels share few compiled programs
        m = int(next_pow2(max(max_win, 128)))
        k = k_sparse
        if state is not None and dev is state.dev:
            # per-track device-cached levels: re-renders skip the build
            mode = "sparse_pre"
            bmax, bmin = state.sparse_levels(k_sparse, m)
        else:
            mode = "sparse"
            bmax = bmin = jnp.zeros((8,), jnp.float32)  # unused placeholder
    elif max_win <= _DIRECT_LIMIT:
        mode = "direct"
        m = m_direct
        bmax = bmin = jnp.zeros((8,), jnp.float32)  # unused placeholder
    else:
        mode = "pooled"
        m = int(round_up_to(max_win // _BLOCK + 2, 8))
        if samples_per_px < 1.0:
            bmax, bmin = _block_minmax(dev)
        else:
            bmax, bmin = state.pooled()

    if dev is state.dev:
        # device col-window cache: an amp-only re-render uploads scalars,
        # not the 8-bytes-per-column index arrays
        col_key = (nwidth, buf_len, c0, c1, offset, n_cols)
        starts_d, ends_d = state.dev_cols(col_key, starts_p, ends_p)
    else:
        starts_d, ends_d = jnp.asarray(starts_p), jnp.asarray(ends_p)
    top, bottom = _envelope_core(
        dev,
        bmax,
        bmin,
        starts_d,
        ends_d,
        float(amp_min),
        float(amp_max),
        state.scale,
        jnp.int32(k),
        m=m,
        nheight=int(nheight),
        n_cols=n_cols,
        mode=mode,
    )
    top, bottom = jax.device_get((top, bottom))  # one fetch round trip
    top = top[:out_cols]
    bottom = bottom[:out_cols]
    return _paint_envelope(top, bottom, int(nheight))


# Paint chunk: <= 2M px per mask (~2 MB bool + ~8 MB RGBA intermediate),
# so a wide render's transient allocation beyond the output array itself
# is bounded regardless of width (round-4 VERDICT weak #3: the one-shot
# (H, W, 1) mask was an extra 2.1 GB at a full-width-hour 4.2M columns).
_PAINT_CHUNK_PX = 1 << 21


def _paint_envelope(top: np.ndarray, bottom: np.ndarray,
                    nheight: int) -> np.ndarray:
    """Host RGBA paint of per-column (top, bottom) rows, in bounded
    column chunks.  Pixel-identical to the one-shot
    ``np.where((rows >= top) & (rows <= bottom), WAVECOLOR, 0)``."""
    out_cols = top.shape[0]
    out = np.zeros((nheight, out_cols, 4), dtype=np.uint8)
    rows = np.arange(nheight, dtype=np.int32)[:, None]  # (H, 1)
    step = max(1, _PAINT_CHUNK_PX // max(nheight, 1))
    for a in range(0, out_cols, step):
        b = min(out_cols, a + step)
        mask = (rows >= top[None, a:b]) & (rows <= bottom[None, a:b])
        out[:, a:b][mask] = WAVECOLOR
    return out
