"""Lossless wire codec for host->device PCM transfer.

The hour-scale workload is wire-bound: the axon relay sustains ~25 MB/s
(tools/profile_hour2.py: 346 MB of PCM16 = 12-14 s) while the full hour of
DFT+mel compute is ~0.5 s.  The only way past that floor is to send fewer
bytes.  This module bit-packs the audio losslessly on the host and unpacks
it ON DEVICE with vectorized integer ops, trading abundant TPU cycles for
scarce wire bytes:

  host:   residual = Delta^k(x)  (k in {0,1,2}, best per segment)
          zigzag -> per-4096-sample-block bit width -> little-endian packing
  device: 2x u32 gather + shift/mask field extraction  (VPU, trivially wide)
          un-zigzag, then Delta^-k as k exact int32 cumsums (parallel prefix)

All delta arithmetic is mod-2^32 (two's-complement wrap), so ANY int32
stream round-trips: residuals of full-range values wrap to int32, the
inverse cumsum wraps back — a bijection, no magnitude bounds needed.

Float32 streams ride the same machinery (``pack_f32``): the IEEE bits are
mapped to an order-preserving int32 (sign-magnitude -> offset two's
complement, so smooth audio keeps small deltas), after stripping the
mantissa bits that are zero across the whole segment (int16/int24-origin
float files have 8-9 such planes).  The transform is a bit-level bijection
— every pattern including -0.0, denormals, Inf and NaN reconstructs
exactly.

Everything is static-shaped (block count derives from the bucketed segment
length) and bit-exact: unpack(pack(x)) == x for all inputs, so the
numerical contract is untouched.  Typical music/speech costs 9-13 bits per
16-bit sample (tonal content far less); full-scale white noise would cost
17-18, so pack() falls back to raw when packing does not pay.

No reference analogue — the reference runs in-process (audio.rs loads
straight into RAM); this layer exists because a TPU is on the far side of
a slow link.
"""

import functools

import numpy as np

BLOCK = 1024  # samples per width block; BLOCK * w bits is always byte-aligned
_LOG2_BLOCK = 10


class PackedPCM:
    """Host-side container for one packed segment."""

    __slots__ = ("order", "n", "head", "words", "block_w", "block_start",
                 "out_dtype", "shift")

    def __init__(self, order, n, head, words, block_w, block_start,
                 out_dtype="int16", shift=0):
        self.order = order          # delta order k (0, 1, 2)
        self.n = n                  # original sample count
        self.head = head            # int32[k] warmup samples
        self.words = words          # uint32[W] packed residual bits
        self.block_w = block_w      # int32[NB] bits per residual
        self.block_start = block_start  # int32[NB] bit offset of each block
        self.out_dtype = out_dtype  # 'int16' / 'int32' (PCM) or 'f32'
        self.shift = shift          # f32 only: stripped mantissa planes

    @property
    def nbytes(self):
        return (self.words.nbytes + self.block_w.nbytes +
                self.block_start.nbytes + self.head.nbytes)


def _zigzag(r):
    # branch-free, mod-2^32 safe for the FULL int32 range: zigzag(v) =
    # (v << 1) ^ (v >> 31 arithmetic), computed in uint32 so full-range
    # residuals wrap instead of tripping undefined/overflow behavior
    ru = r.astype(np.uint32)
    return (ru << np.uint32(1)) ^ (np.uint32(0) - (ru >> np.uint32(31)))


def _pack_rows(vals, w):
    """Pack (k, BLOCK) uint32 fields of exact width w into (k, BLOCK*w/8)
    little-endian bytes, with only strided vectorized ops.

    Samples whose index is congruent mod g = 8/gcd(w,8) share the same
    bit-within-byte phase and a uniform byte stride of w*g/8, so each of
    the <=8 phases is <=4 wide OR-assignments — ~4 byte-ops per sample on
    the single host core (which must outrun the ~25 MB/s wire), with no
    per-bit matrix and no width rounding.
    """
    import math

    k, B = vals.shape
    rows = np.zeros((k, B * w // 8), np.uint8)
    g = 8 // math.gcd(w, 8)
    step = w * g // 8
    npha = B // g
    for c in range(g):
        ph = (c * w) % 8
        byte0 = (c * w) // 8
        if w + ph > 32:  # widest fields need a 64-bit staging shift
            shifted = vals[:, c::g].astype(np.uint64) << np.uint64(ph)
        else:
            shifted = vals[:, c::g] << np.uint32(ph)
        for j in range((w + ph + 7) // 8):
            b = ((shifted >> shifted.dtype.type(8 * j))
                 & shifted.dtype.type(0xFF)).astype(np.uint8)
            rows[:, byte0 + j : byte0 + j + step * npha : step] |= b
    return rows


def _pack_bits(z, widths):
    """Pack z (NB*BLOCK uint32, block b limited to widths[b] bits) into a
    little-endian bit stream; returns (uint8 bytes, int64 bit starts)."""
    nb = len(widths)
    bits_per_block = widths.astype(np.int64) * BLOCK
    starts = np.zeros(nb, np.int64)
    np.cumsum(bits_per_block[:-1], out=starts[1:])
    zb = z.reshape(nb, BLOCK)
    # pack per width group, then stitch in block order with one concatenate
    # (a fancy-index scatter would push 8-byte indices per output byte
    # through the single core — 3x the traffic of the data itself)
    pieces = [None] * nb
    empty = np.zeros(0, np.uint8)
    for w in np.unique(widths):
        sel = np.nonzero(widths == w)[0]
        if w == 0:
            for b in sel:
                pieces[b] = empty
            continue
        rows = _pack_rows(zb[sel], int(w))
        for i, b in enumerate(sel):
            pieces[b] = rows[i]
    out = np.concatenate(pieces) if pieces else empty
    return out, starts


_NATIVE = None
_NATIVE_TRIED = False


def _native_lib():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import ctypes
    import os

    so = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "native",
                     "libmsv_native.so")
    )
    try:
        lib = ctypes.CDLL(so)
        c = ctypes
        lib.msv_wirepack_pack.argtypes = [
            c.POINTER(c.c_int16), c.c_int64, c.c_int32, c.c_int32,
            c.POINTER(c.POINTER(c.c_uint8)), c.POINTER(c.c_int64),
            c.POINTER(c.POINTER(c.c_int32)), c.POINTER(c.POINTER(c.c_int32)),
            c.POINTER(c.c_int64), c.POINTER(c.c_int32),
            c.POINTER(c.c_int32),
        ]
        lib.msv_wirepack_pack.restype = c.c_int32
        lib.msv_wirepack_pack_i32.argtypes = (
            [c.POINTER(c.c_int32)] + lib.msv_wirepack_pack.argtypes[1:]
        )
        lib.msv_wirepack_pack_i32.restype = c.c_int32
        lib.msv_free_ptr.argtypes = [c.c_void_p]
        lib.msv_free_ptr.restype = None
        _NATIVE = lib
    except (OSError, AttributeError):
        _NATIVE = None
    return _NATIVE


def _pack_int_native(x: np.ndarray, out_dtype: str):
    """C packer (native/wirepack.cc): identical bitstream, one streaming
    pass per stage — the single host core must outrun the ~25-40 MB/s wire,
    and the numpy packer tops out around it."""
    import ctypes as c

    lib = _native_lib()
    if lib is None:
        return False, None
    out_bytes = c.POINTER(c.c_uint8)()
    out_nbytes = c.c_int64()
    out_widths = c.POINTER(c.c_int32)()
    out_starts = c.POINTER(c.c_int32)()
    out_nblocks = c.c_int64()
    out_order = c.c_int32()
    head_buf = (c.c_int32 * 2)()
    if x.dtype == np.int32:
        rc = lib.msv_wirepack_pack_i32(
            x.ctypes.data_as(c.POINTER(c.c_int32)), len(x), BLOCK, 2,
            c.byref(out_bytes), c.byref(out_nbytes), c.byref(out_widths),
            c.byref(out_starts), c.byref(out_nblocks), c.byref(out_order),
            head_buf,
        )
    else:
        rc = lib.msv_wirepack_pack(
            x.ctypes.data_as(c.POINTER(c.c_int16)), len(x), BLOCK, 2,
            c.byref(out_bytes), c.byref(out_nbytes), c.byref(out_widths),
            c.byref(out_starts), c.byref(out_nblocks), c.byref(out_order),
            head_buf,
        )
    if rc != 0:
        return True, None  # handled: raw is better
    try:
        nb = out_nblocks.value
        order = out_order.value
        data = np.ctypeslib.as_array(out_bytes, shape=(out_nbytes.value,)).copy()
        widths = np.ctypeslib.as_array(out_widths, shape=(nb,)).copy()
        starts = np.ctypeslib.as_array(out_starts, shape=(nb,)).copy()
    finally:
        lib.msv_free_ptr(out_bytes)
        lib.msv_free_ptr(out_widths)
        lib.msv_free_ptr(out_starts)
    return True, PackedPCM(
        order=order,
        n=len(x),
        head=np.asarray(head_buf[:order], np.int32),
        words=np.ascontiguousarray(data.view("<u4")),
        block_w=widths,
        block_start=starts,
        out_dtype=out_dtype,
    )


def pack_int(x: np.ndarray, max_order: int = 2, native: bool | None = None):
    """Pack integer PCM: int16 (raw samples) or int32 (channel sums,
    scaled-int carriers, ordered-float transforms — the FULL int32 range,
    delta arithmetic is mod 2^32).  Returns PackedPCM, or None when the
    raw array is smaller (e.g. full-scale noise) — callers then ship raw.

    Uses the native C packer when built (identical bitstream, ~20x the
    throughput of the numpy path, which remains the oracle/fallback);
    ``native=False`` forces numpy, ``native=True`` requires the C path.
    """
    if x.dtype == np.int32:
        out_dtype = "int32"
        x = np.ascontiguousarray(x)
        n = len(x)
        if n <= 2 * BLOCK:
            return None
    else:
        out_dtype = "int16"
        x = np.ascontiguousarray(x, dtype=np.int16)
        n = len(x)
        if n <= 2 * BLOCK:
            return None  # not worth the metadata for tiny inputs
    if native is not False and max_order == 2:
        handled, packed = _pack_int_native(x, out_dtype)
        if handled:
            return packed
        if native is True:
            raise RuntimeError("native wirepack requested but unavailable")
    xi = x.astype(np.int32)

    def _block_widths(r):
        """Exact per-block zigzag bit widths from residual min/max (avoids
        materializing the zigzag for candidate orders we won't pick)."""
        nr = len(r)
        nb = -(-nr // BLOCK)
        if nr < nb * BLOCK:
            rp = np.zeros(nb * BLOCK, np.int32)
            rp[:nr] = r
        else:
            rp = r
        r2 = rp.reshape(nb, BLOCK)
        hi = r2.max(axis=1).astype(np.int64)
        lo = r2.min(axis=1).astype(np.int64)
        zmax = np.maximum(hi * 2, -lo * 2 - 1)  # zigzag(max), zigzag(min)
        widths = np.where(
            zmax > 0,
            # exact: log2 on float64 is exact for < 2^53
            np.floor(
                np.log2(np.maximum(zmax, 1).astype(np.float64))
            ).astype(np.int32)
            + 1,
            0,
        ).astype(np.int32)
        return widths, nb

    best = None
    r = xi
    heads_chain = []
    residuals = []
    for order in range(max_order + 1):
        residuals.append(r)
        widths, nb = _block_widths(r)
        total_bits = int((widths.astype(np.int64) * BLOCK).sum())
        cost = total_bits // 8 + nb * 8 + 64
        if best is None or cost < best[0]:
            best = (cost, order, widths, nb, list(heads_chain))
        if order < max_order:
            heads_chain.append(r[0])  # head[k] = (Delta^k x)[0]
            r = np.diff(r)

    cost, order, widths, nb, heads = best
    if cost >= x.nbytes:
        return None
    z = _zigzag(residuals[order])
    zp = np.zeros(nb * BLOCK, np.uint32)
    zp[: len(z)] = z
    data, starts = _pack_bits(zp, widths)
    if starts.size and int(starts[-1] + widths[-1] * BLOCK) >= 2**31:
        return None  # 2 Gbit segment: block_start would overflow int32
    # pad so the hi-word gather at the last field stays in bounds (two
    # spare words: an all-zero-width stream still gathers words[0] and [1])
    pad = (-len(data)) % 4 + 8
    data = np.pad(data, (0, pad))
    words = data.view("<u4")
    return PackedPCM(
        order=order,
        n=n,
        head=np.asarray(heads, np.int32),
        words=np.ascontiguousarray(words),
        block_w=widths,
        block_start=starts.astype(np.int32),
        out_dtype=out_dtype,
    )


def _f32_to_ordered(x: np.ndarray):
    """float32 -> (order-preserving int32, stripped-plane count t).

    Sign-magnitude IEEE bits map to offset two's complement — positives to
    their magnitude M' in [0, 2^31), negatives (incl. -0.0) to -(M'+1) —
    a bit-level bijection that is monotonic in float value, so smooth
    audio keeps small deltas.  ``t`` mantissa planes that are zero across
    the whole segment are stripped first (int-origin float files have
    8-9); M' = M >> t.
    """
    b = x.view(np.uint32)
    mag = b & np.uint32(0x7FFFFFFF)
    sign = (b >> np.uint32(31)).astype(bool)
    orr = int(np.bitwise_or.reduce(mag)) if len(mag) else 0
    t = ((orr & -orr).bit_length() - 1) if orr else 31
    mp = (mag >> np.uint32(t)).astype(np.int64)
    return np.where(sign, -(mp + 1), mp).astype(np.int32), t


def _ordered_to_f32(o: np.ndarray, t: int) -> np.ndarray:
    """Inverse of :func:`_f32_to_ordered` (host oracle)."""
    sign = o < 0
    mp = np.where(sign, ~o, o).astype(np.uint32)  # ~o == -(o+1), no overflow
    b = (mp << np.uint32(t)) | (sign.astype(np.uint32) << np.uint32(31))
    return b.view(np.float32)


def pack_f32(x: np.ndarray, native: bool | None = None):
    """Pack a float32 stream losslessly (bit-exact incl. -0.0/Inf/NaN).

    Returns PackedPCM(out_dtype='f32', shift=t) or None when raw f32 is
    smaller (true full-entropy float content).  Scaled-int sources should
    prefer an int carrier upstream (linear-domain deltas pack tighter);
    this path covers everything else at typically 20-60% fewer bytes.
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    if len(x) <= 2 * BLOCK:
        return None
    o, t = _f32_to_ordered(x)
    p = pack_int(o, native=native)
    if p is None:
        return None
    p.out_dtype = "f32"
    p.shift = t
    return p


def unpack_np(p: PackedPCM) -> np.ndarray:
    """Host-side reference unpack (oracle for the device version)."""
    nb = len(p.block_w)
    i = np.arange(nb * BLOCK, dtype=np.int64)
    b = i >> _LOG2_BLOCK
    w = p.block_w[b].astype(np.int64)
    pos = p.block_start[b].astype(np.int64) + (i & (BLOCK - 1)) * w
    widx = pos >> 5
    sh = pos & 31
    lo = p.words[widx].astype(np.uint64)
    hi = p.words[widx + 1].astype(np.uint64)
    shu = sh.astype(np.uint64)
    up = np.where(sh > 0, (hi << ((64 - shu) & 63)) >> 32, 0)
    f = (lo >> shu) | up
    z = (f & ((np.uint64(1) << w.astype(np.uint64)) - 1)).astype(np.int64)
    r = (z >> 1) ^ -(z & 1)
    nr = p.n - p.order
    r = r[:nr].astype(np.int32)
    x = r
    for head_v in p.head[::-1]:
        # int32 cumsum wraps mod 2^32 — the exact inverse of the wrapped
        # deltas, so full-range streams reconstruct bit-for-bit
        x = np.concatenate([[head_v], head_v + np.cumsum(x, dtype=np.int32)])
    if p.out_dtype == "f32":
        return _ordered_to_f32(x, p.shift)
    return x.astype(np.int16 if p.out_dtype == "int16" else np.int32)


_WMAX = 32  # full-range int32 residuals (ordered-float / scaled-int
# carriers) zigzag to <= 32 bits under mod-2^32 arithmetic; one shared
# bound keeps ONE compiled unpack program per segment shape for every
# input kind (int16 PCM only ever uses <= 18 of the 33 width branches)
_ROW_WORDS = BLOCK * _WMAX // 32  # u32 words covering one max-width block


def _decode_dense(words, block_w, block_start, n_blocks):
    """Trace-time dense field decode shared by unpack_device and
    unpack2_device (contractually bit-identical for the dense stream):
    scan over blocks, dynamic-slice each block's (32-bit-aligned) words,
    expand to a bit vector, and a (WMAX+1)-way static-width switch
    reassembles the fields.  No gathers anywhere.  Returns the zigzag
    stream (n_blocks * BLOCK,) uint32."""
    import jax
    import jax.numpy as jnp

    words_p = jnp.pad(words, (0, _ROW_WORDS))
    start_word = (block_start >> 5).astype(jnp.int32)
    pow2 = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)

    def decode_w(w):
        def f(row_bits):
            if w == 0:
                return jnp.zeros((BLOCK,), jnp.uint32)
            fld = row_bits[: BLOCK * w].reshape(BLOCK, w)
            return (fld * pow2[:w]).sum(axis=1, dtype=jnp.uint32)

        return f

    branches = [decode_w(w) for w in range(_WMAX + 1)]
    shifts32 = jnp.arange(32, dtype=jnp.uint32)

    def step(_, sw_w):
        sw, w = sw_w
        row = jax.lax.dynamic_slice(words_p, (sw,), (_ROW_WORDS,))
        row_bits = (
            (row[:, None] >> shifts32[None, :]) & jnp.uint32(1)
        ).reshape(-1)
        z = jax.lax.switch(jnp.clip(w, 0, _WMAX), branches, row_bits)
        return None, z

    _, zrows = jax.lax.scan(step, None, (start_word, block_w))
    return zrows.reshape(n_blocks * BLOCK)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n", "n_blocks", "out_dtype"),
)
def unpack_device(words, block_w, block_start, head, order, shift, *, n,
                  n_blocks, out_dtype="int16"):
    """Device unpack -> int[n].  Gather-free by construction.

    A naive two-word gather per field runs at ~58M fields/s on the TPU
    (0.58 s per 33 MB segment — 12x the whole DFT pipeline), so instead a
    lax.scan walks blocks: each step dynamic-slices the block's words
    (block starts are always 32-bit aligned: BLOCK*w % 32 == 0), expands
    them to a dense bit vector with plain shifts, and a (WMAX+1)-way
    lax.switch on the block width does a STATIC slice+reshape+weighted-sum
    — all VPU ops, no gathers anywhere.  The delta inverse is `order`
    exact int32 cumsums (intermediate values telescope back to bounded
    sample deltas, so int32 never overflows).

    Program-cache discipline (CLAUDE.md: remote compiles cost 40-740 s and
    all jit shapes are bucketed): ``order`` is a TRACED scalar handled by
    a 3-way switch, and callers must pass ``words`` padded to a bucketed
    length (unpack_jax does; trailing zeros are inert since fields are
    addressed via block_start) — otherwise every distinct packed size
    would compile a fresh executable.
    """
    import jax
    import jax.numpy as jnp

    z = _decode_dense(words, block_w, block_start, n_blocks)
    # un-zigzag in uint32 then bitcast: full-width (w=32) fields exceed
    # int32 as values, but the BITS are exactly the wrapped residual
    r = jax.lax.bitcast_convert_type(
        (z >> jnp.uint32(1)) ^ (jnp.uint32(0) - (z & jnp.uint32(1))),
        jnp.int32,
    )
    # the v1 grid covers n - order residuals, so for n % BLOCK in
    # {1, .., order} the dense stream is SHORTER than n and the
    # lax.switch branches below would trace mismatched shapes (inv0
    # yields n_blocks*BLOCK < n vs inv1/inv2's n) — found by review with
    # a 2049-sample repro.  Static zero-pad restores the invariant; the
    # inverse never reads the padding (inv_k uses r[:n-k]).
    if r.shape[0] < n:
        r = jnp.pad(r, (0, n - r.shape[0]))

    # delta inverse per order, all branches emitting (n,) so `order` can
    # stay traced (3 programs -> 1)
    def inv0(_):
        return r[:n]

    def inv1(_):
        return jnp.concatenate(
            [head[0:1], head[0] + jnp.cumsum(r[: n - 1], dtype=jnp.int32)]
        )

    def inv2(_):
        d1 = jnp.concatenate(
            [head[1:2], head[1] + jnp.cumsum(r[: n - 2], dtype=jnp.int32)]
        )
        return jnp.concatenate(
            [head[0:1], head[0] + jnp.cumsum(d1, dtype=jnp.int32)]
        )

    x = jax.lax.switch(jnp.clip(order, 0, 2), [inv0, inv1, inv2], None)
    if out_dtype == "int16":
        return x.astype(jnp.int16)
    if out_dtype == "int32":
        return x
    # f32: inverse ordered-float transform (see _f32_to_ordered); ``shift``
    # is TRACED so every stripped-plane count shares one program
    sign = x < 0
    mp = jax.lax.bitcast_convert_type(jnp.where(sign, ~x, x), jnp.uint32)
    b = (mp << shift.astype(jnp.uint32)) | (
        sign.astype(jnp.uint32) << jnp.uint32(31)
    )
    return jax.lax.bitcast_convert_type(b, jnp.float32)


pack_i16 = pack_int  # backwards-compatible alias


def _bucket_words(nwords: int, n: int, itemsize: int) -> int:
    """Padded words length: 1/16-of-raw granularity so the jit program
    family stays small (<=16 shapes per segment bucket) while wire waste
    stays <=6.25% of the raw size (in practice ~3%)."""
    raw_words = max(1, (n * itemsize + 3) // 4)
    gran = max(1024, raw_words // 16)
    return min(-(-nwords // gran) * gran, raw_words + gran)


def unpack_jax(p: PackedPCM):
    """Unpack a PackedPCM on the default device -> int16/int32/f32[n]."""
    import jax.numpy as jnp

    itemsize = 2 if p.out_dtype == "int16" else 4
    nb = _bucket_words(len(p.words), p.n, itemsize)
    words = p.words
    if nb > len(words):
        words = np.pad(words, (0, nb - len(words)))
    head = np.zeros(2, np.int32)
    head[: p.order] = p.head
    return unpack_device(
        jnp.asarray(words),
        jnp.asarray(p.block_w),
        jnp.asarray(p.block_start),
        jnp.asarray(head),
        jnp.int32(p.order),
        jnp.int32(p.shift),
        n=p.n,
        n_blocks=len(p.block_w),
        out_dtype=p.out_dtype,
    )


# ---------------------------------------------------------------------------
# Downlink codec: device-packed spectrogram export (the wirepack in reverse).
#
# get_spec_db at hour scale fetches (n_frames, n_out) f32 — ~0.5 GB over the
# ~20 MB/s relay.  The reference keeps this array in RAM (`specs`, lib.rs:80)
# and never pays a wire; we pack it ON DEVICE and unpack host-side:
#
#   device: quantize dB to a b-bit grid on [lo, hi] -> per-mel-row deltas
#           along frames (first frame absolute) -> zigzag -> per-1024-block
#           bit width -> dense little-endian bitstream (lax.scan, word-
#           aligned dynamic_update_slice; no gathers)
#   host:   numpy field extraction (the unpack_np pattern) -> un-zigzag ->
#           row cumsum -> dequantize
#
# The quantized-domain round trip is BIT-exact (tested); the only loss is
# the b-bit grid itself: |db' - db| <= 0.5 * (hi - lo) / (2^b - 1), i.e.
# ~0.0009 dB for b=16 on a 120 dB window — orders of magnitude below one
# grey step (0.47 dB).  b <= 16 keeps every zigzag delta < 2^17 so widths
# fit the same machinery as the uplink.
# ---------------------------------------------------------------------------

@functools.partial(
    __import__("jax").jit, static_argnames=("bits",)
)
def pack_spec_device(db, lo, hi, *, bits):
    """(F, n_out) f32 dB -> (words, widths, nwords_used).

    ``words`` is a worst-case-sized u32 buffer whose used prefix holds the
    packed stream; ``widths`` the per-block bit widths; ``nwords_used``
    the exact used word count (fetch only that prefix).  ``lo``/``hi``
    (traced f32 scalars) define the quantization window.

    Layout note: a lax.scan emits per-block staging rows and ONE scatter
    compacts them to their cumulative word offsets.  (A first cut carried
    the output buffer through the scan with dynamic_update_slice writes —
    XLA copied the multi-MB carry every step: 180 s for a 10-minute
    spectrogram.  Scan-outputs + scatter runs the same workload in ~0.2 s.)
    """
    import jax
    import jax.numpy as jnp

    f, n_out = db.shape
    qmax = (1 << bits) - 1
    rng = hi - lo
    scale = jnp.where(rng > 0, qmax / rng, 1.0).astype(jnp.float32)
    q = jnp.clip(
        jnp.round((db - lo) * scale), 0, qmax
    ).astype(jnp.int32)
    qt = q.T  # (n_out, F): deltas run along frames within each output row
    d = jnp.concatenate([qt[:, :1], qt[:, 1:] - qt[:, :-1]], axis=1)
    z = _zigzag_jnp(d.reshape(-1))  # uint32, < 2^(bits+1)
    n_vals = n_out * f
    n_blocks = -(-n_vals // BLOCK)
    z = jnp.pad(z, (0, n_blocks * BLOCK - n_vals))
    zb = z.reshape(n_blocks, BLOCK)
    zmax = zb.max(axis=1)
    pow2 = jnp.uint32(1) << jnp.arange(bits + 1, dtype=jnp.uint32)
    widths = (zmax[:, None] >= pow2[None, :]).sum(axis=1).astype(jnp.int32)
    words_per_block = widths * (BLOCK // 32)
    start_word = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(words_per_block)[:-1]]
    )
    nwords_used = jnp.sum(words_per_block)

    row_words = BLOCK * (bits + 1) // 32  # staging row = widest block
    bitpos = jnp.arange(32, dtype=jnp.uint32)
    word_pow2 = jnp.uint32(1) << bitpos

    def encode_w(w):
        def enc(zrow):
            if w == 0:
                return jnp.zeros((row_words,), jnp.uint32)
            bits_m = ((zrow[:, None] >> bitpos[None, :w]) & jnp.uint32(1))
            wr = bits_m.reshape(BLOCK * w // 32, 32)
            row = (wr * word_pow2[None, :]).sum(axis=1, dtype=jnp.uint32)
            return jnp.pad(row, (0, row_words - row.shape[0]))

        return enc

    branches = [encode_w(w) for w in range(bits + 2)]

    def step(_, blk):
        zrow, w = blk
        return None, jax.lax.switch(jnp.clip(w, 0, bits + 1), branches, zrow)

    _, rows = jax.lax.scan(step, None, (zb, widths))
    wcap = n_blocks * row_words
    j = jnp.arange(row_words, dtype=jnp.int32)[None, :]
    valid = j < words_per_block[:, None]
    # staging tails all land on the dropped sentinel slot wcap
    idx = jnp.where(valid, start_word[:, None] + j, wcap)
    out = (
        jnp.zeros(wcap + 1, jnp.uint32)
        .at[idx.reshape(-1)]
        .set(rows.reshape(-1))
    )
    return out[:wcap], widths, nwords_used


def _zigzag_jnp(d):
    import jax.numpy as jnp

    du = d.astype(jnp.uint32)
    return (du << jnp.uint32(1)) ^ (jnp.uint32(0) - (du >> jnp.uint32(31)))


@functools.lru_cache(maxsize=64)
def _prefix_slicer(size: int):
    import jax

    return jax.jit(
        lambda w: jax.lax.dynamic_slice(w, (0,), (size,))
    )


@functools.lru_cache(maxsize=64)
def _range_slicer(size: int):
    import jax

    # start is TRACED: every chunk of one size shares a program
    return jax.jit(
        lambda w, s: jax.lax.dynamic_slice(w, (s,), (size,))
    )


def fetch_packed_prefix(words, nwords_used: int):
    """Fetch only the used prefix of the device words buffer, rounded up
    to 1/16-of-capacity granularity so the slice-program family stays
    bounded (the fetch size, not the buffer size, is what the wire pays)."""
    cap = words.shape[0]
    gran = max(1024, cap // 16)
    size = min(-(-max(nwords_used, 1) // gran) * gran, cap)
    return np.asarray(_prefix_slicer(size)(words))


DECODE_THREADS: int | None = None  # None = auto (host cores, capped at 8)
_MT_MIN_VALS = 1 << 20  # below this, thread fork/join beats the win


def _decode_threads() -> int:
    """Host threads for the packed-spec decode.  The decode is
    embarrassingly parallel by output rows (each row's first frame is
    absolute), so on multi-core hosts the wall drops toward the byte
    ratio; this dev VM has one core, where the helpers collapse to the
    direct call.  Set ``DECODE_THREADS`` to pin (tests force >1)."""
    if DECODE_THREADS is not None:
        return max(1, int(DECODE_THREADS))
    import os

    return max(1, min(os.cpu_count() or 1, 8))


def _ensure_spec_types(lib):
    import ctypes as c

    if getattr(_ensure_spec_types, "_typed", False):
        return
    i64p = c.POINTER(c.c_int64)
    lib.msv_spec_decode_range.argtypes = [
        c.POINTER(c.c_uint32), c.POINTER(c.c_int32), i64p,
        c.c_int64, c.c_int64, c.c_int64, c.c_int64, i64p,
        c.POINTER(c.c_uint16),
    ]
    lib.msv_spec_decode_range.restype = c.c_int32
    lib.msv_spec_dequant_transpose_range.argtypes = [
        c.POINTER(c.c_uint16), c.c_int64, c.c_int64, c.c_int64, c.c_int64,
        c.c_float, c.c_float, c.POINTER(c.c_float),
    ]
    lib.msv_spec_dequant_transpose_range.restype = c.c_int32
    _ensure_spec_types._typed = True


def _decode_range_mt(lib, bufp, wip, swp, qp, v0, v1, n_vals, f_pad, carry,
                     n_threads):
    """Decode packed values [v0, v1) with up to ``n_threads`` threads.

    Segment 0 continues the persistent ``carry`` (numpy int64[2]); later
    segments start at row boundaries, where the decoder state is known
    (col=0, acc resets on the absolute first frame).  On return ``carry``
    holds the (col, acc) state at v1, so chunked calls chain exactly like
    the single-thread decoder.  ctypes releases the GIL, so the C calls
    genuinely run in parallel.
    """
    import ctypes as c
    import threading

    if v1 <= v0:
        return
    cp = carry.ctypes.data_as(c.POINTER(c.c_int64))
    r0 = -(-v0 // f_pad) * f_pad  # first row boundary >= v0
    # small ranges do not pay for fork/join; one-row ranges cannot be
    # split at all
    if n_threads <= 1 or (v1 - v0) < _MT_MIN_VALS or r0 >= v1:
        lib.msv_spec_decode_range(bufp, wip, swp, v0, v1, n_vals, f_pad,
                                  cp, qp)
        return
    n_rows = -(-(v1 - r0) // f_pad)
    nseg = min(n_threads, n_rows)
    rows_per = -(-n_rows // nseg)
    bounds = [v0, r0] if r0 > v0 else [v0]
    b = r0
    while b + rows_per * f_pad < v1:
        b += rows_per * f_pad
        bounds.append(b)
    bounds.append(v1)
    segs = list(zip(bounds[:-1], bounds[1:]))
    carries = [carry] + [np.zeros(2, np.int64) for _ in segs[1:]]

    def run(a, z, car):
        lib.msv_spec_decode_range(
            bufp, wip, swp, a, z, n_vals, f_pad,
            car.ctypes.data_as(c.POINTER(c.c_int64)), qp,
        )

    ts = [
        threading.Thread(target=run, args=(a, z, car))
        for (a, z), car in zip(segs, carries)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    if len(segs) > 1:
        carry[:] = carries[-1]


def _dequant_mt(lib, qp, n_out, f_pad, n_frames, lo, scale, outp,
                n_threads):
    """Transpose+dequant with frame-range threads (disjoint out slabs)."""
    import ctypes as c
    import threading

    if n_threads <= 1 or n_frames * n_out < 2 * _MT_MIN_VALS:
        lib.msv_spec_dequant_transpose_range(
            qp, n_out, f_pad, 0, n_frames, c.c_float(lo), c.c_float(scale),
            outp,
        )
        return
    nseg = min(n_threads, n_frames)
    per = -(-n_frames // nseg)

    def run(c0, c1):
        lib.msv_spec_dequant_transpose_range(
            qp, n_out, f_pad, c0, c1, c.c_float(lo), c.c_float(scale), outp,
        )

    ts = []
    for k in range(nseg):
        c0 = k * per
        c1 = min(n_frames, c0 + per)
        if c0 >= c1:
            break
        ts.append(threading.Thread(target=run, args=(c0, c1)))
    for t in ts:
        t.start()
    for t in ts:
        t.join()


def _unpack_spec_native(words, widths, n_frames, n_out, f_pad, lo, scale):
    """C single-pass decode+cumsum+dequant (native/spec_unpack.cc).

    The numpy path makes ~10 memory passes with large temporaries; this
    VM's host memory bandwidth swings 30x between windows (measured), so
    byte traffic is the budget — the C pass touches packed-in + q + out
    once each.  Returns None when the native lib isn't built.
    """
    import ctypes as c

    lib = _native_lib()
    if lib is None or not hasattr(lib, "msv_spec_unpack"):
        return None
    if not getattr(_unpack_spec_native, "_typed", False):
        lib.msv_spec_unpack.argtypes = [
            c.POINTER(c.c_uint32), c.POINTER(c.c_int32), c.c_int64,
            c.c_int64, c.c_int64, c.c_int64, c.c_float, c.c_float,
            c.POINTER(c.c_float),
        ]
        lib.msv_spec_unpack.restype = c.c_int32
        _unpack_spec_native._typed = True
    # the bit walker reads an unaligned u64 at the final field: guarantee
    # 8 spare bytes past the used stream
    wpad = np.pad(np.ascontiguousarray(words), (0, 2))
    widths = np.ascontiguousarray(widths, dtype=np.int32)
    out = np.empty((n_frames, n_out), np.float32)
    nt = _decode_threads()
    nb = len(widths)
    n_vals = n_out * f_pad
    if nb * BLOCK < n_vals:
        return None
    if nt > 1 and n_vals >= _MT_MIN_VALS:
        # multi-core host: fan the row-independent decode + the disjoint
        # frame-slab dequant out over threads (bit-identical — the same C
        # code runs either way, rows never interact)
        _ensure_spec_types(lib)
        wpb = widths.astype(np.int64) * (BLOCK // 32)
        start_word = np.zeros(nb, np.int64)
        np.cumsum(wpb[:-1], out=start_word[1:])
        q = np.empty(n_vals, np.uint16)
        carry = np.zeros(2, np.int64)
        _decode_range_mt(
            lib,
            wpad.ctypes.data_as(c.POINTER(c.c_uint32)),
            widths.ctypes.data_as(c.POINTER(c.c_int32)),
            start_word.ctypes.data_as(c.POINTER(c.c_int64)),
            q.ctypes.data_as(c.POINTER(c.c_uint16)),
            0, nb * BLOCK, n_vals, f_pad, carry, nt,
        )
        _dequant_mt(
            lib, q.ctypes.data_as(c.POINTER(c.c_uint16)), n_out, f_pad,
            n_frames, lo, scale,
            out.ctypes.data_as(c.POINTER(c.c_float)), nt,
        )
        return out
    rc = lib.msv_spec_unpack(
        wpad.ctypes.data_as(c.POINTER(c.c_uint32)),
        widths.ctypes.data_as(c.POINTER(c.c_int32)),
        nb, n_out, f_pad, n_frames,
        c.c_float(lo), c.c_float(scale),
        out.ctypes.data_as(c.POINTER(c.c_float)),
    )
    return out if rc == 0 else None


def unpack_spec_np(words, widths, n_frames: int, n_out: int, f_pad: int,
                   lo: float, hi: float, bits: int,
                   native: bool | None = None) -> np.ndarray:
    """Host unpack+dequantize -> (n_frames, n_out) f32 dB.

    ``words`` may be the (bucket-padded) used prefix; fields are addressed
    via the width cumsum so trailing padding is inert.  Uses the C
    single-pass decoder when built (identical output bit-for-bit; the
    numpy path below is the oracle/fallback); ``native=False`` forces
    numpy.  Width-grouped strided shift extraction keeps the numpy path
    ahead of the per-field gather form.
    """
    import math

    qmax_f = (1 << bits) - 1
    rngv0 = np.float32(hi) - np.float32(lo)
    scale0 = np.float32(qmax_f) / rngv0 if rngv0 > 0 else np.float32(1.0)
    if native is not False:
        out = _unpack_spec_native(
            words, widths, n_frames, n_out, f_pad, float(np.float32(lo)),
            float(scale0),
        )
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native spec unpack requested but unavailable")

    nb = len(widths)
    wpb = widths.astype(np.int64) * (BLOCK // 32)
    start_word = np.zeros(nb, np.int64)
    np.cumsum(wpb[:-1], out=start_word[1:])
    words = np.ascontiguousarray(words)
    z = np.zeros((nb, BLOCK), np.uint32)
    for wv in np.unique(widths):
        w = int(wv)
        if w == 0:
            continue  # z rows stay 0
        sel = np.nonzero(widths == wv)[0]
        nwords_b = BLOCK * w // 32
        payload = words[start_word[sel, None] + np.arange(nwords_b)[None, :]]
        # strided field extraction (the _pack_rows inverse): fields whose
        # index is congruent mod g share a bit phase and a uniform word
        # stride, so each of the <=32 phases is <=2 shifts + a mask on a
        # strided view — ~4 u32 ops/field, no 8x bit expansion
        g = 32 // math.gcd(w, 32)
        stride = w * g // 32
        ngroups = BLOCK // g
        mask = np.uint32((1 << w) - 1)
        out = np.empty((len(sel), BLOCK), np.uint32)
        for p in range(g):
            bitoff = (p * w) % 32
            w0 = (p * w) // 32
            fld = payload[:, w0::stride][:, :ngroups] >> np.uint32(bitoff)
            if bitoff + w > 32:  # field straddles into the next word
                nxt = payload[:, w0 + 1 :: stride][:, :ngroups]
                fld = fld | (nxt << np.uint32(32 - bitoff))
            out[:, p::g] = fld & mask
        z[sel] = out
    z = z.reshape(-1)
    d = ((z >> np.uint32(1)).astype(np.int32)
         ^ -(z & np.uint32(1)).astype(np.int32))
    d = d[: n_out * f_pad].reshape(n_out, f_pad)
    q = np.cumsum(d, axis=1, dtype=np.int32)
    db = (q[:, :n_frames].T.astype(np.float32) / scale0) + np.float32(lo)
    return np.ascontiguousarray(db)


def fetch_unpack_spec_stream(words, widths, nwords_used: int, n_frames: int,
                             n_out: int, f_pad: int, lo: float, hi: float,
                             bits: int, nchunks: int = 4) -> np.ndarray:
    """Pipelined fetch + decode of a device-packed spectrogram.

    The used word prefix is fetched in ``nchunks`` equal bucketed slices;
    while slice k+1 is in flight over the relay (network WAIT, not CPU),
    a worker thread runs the C block decoder over every block whose words
    have landed — so the wall is ~max(fetch, decode) instead of their sum.
    On multi-core hosts each chunk's decode additionally fans out over
    row-aligned ranges (every output row's first frame is absolute, so
    rows decode independently) and the final transpose+dequant splits by
    frame slabs — the decode wall drops toward the byte ratio instead of
    being single-core-bound.  Identical output to :func:`unpack_spec_np`
    in every configuration (the same carry-chained C decoder runs either
    way; tests pin bit-equality across thread counts and seams).

    Falls back to the non-pipelined numpy path when the native lib is
    absent.
    """
    import ctypes as c
    import threading

    import jax.numpy as jnp

    lib = _native_lib()
    if lib is None or not hasattr(lib, "msv_spec_decode_range"):
        wp = fetch_packed_prefix(words, nwords_used)
        return unpack_spec_np(wp, widths, n_frames, n_out, f_pad, lo, hi,
                              bits, native=False)
    _ensure_spec_types(lib)
    nt = _decode_threads()

    widths = np.ascontiguousarray(widths, dtype=np.int32)
    nb = len(widths)
    wpb = widths.astype(np.int64) * (BLOCK // 32)
    start_word = np.zeros(nb, np.int64)
    np.cumsum(wpb[:-1], out=start_word[1:])
    end_words = start_word + wpb

    cap = words.shape[0]
    used = max(int(nwords_used), 1)
    # coarse buckets (1/32 of the static capacity) keep the slicer-program
    # family small; ceil() guarantees the chunks cover the used prefix
    gran = max(4096, cap // 32)
    size = min(-(-(-(-used // nchunks)) // gran) * gran, cap)

    n_vals = n_out * f_pad
    q = np.empty(n_vals, np.uint16)
    buf = np.zeros(nchunks * size + 2, np.uint32)  # +2: spare u64 read room
    carry = np.zeros(2, np.int64)
    state = {"b_done": 0, "thread": None}

    qp = q.ctypes.data_as(c.POINTER(c.c_uint16))
    bufp = buf.ctypes.data_as(c.POINTER(c.c_uint32))
    wip = widths.ctypes.data_as(c.POINTER(c.c_int32))
    swp = start_word.ctypes.data_as(c.POINTER(c.c_int64))

    def decode_upto(b_ready):
        b0 = state["b_done"]
        if b_ready <= b0:
            return
        _decode_range_mt(lib, bufp, wip, swp, qp, b0 * BLOCK,
                         b_ready * BLOCK, n_vals, f_pad, carry, nt)
        state["b_done"] = b_ready

    sl = _range_slicer(size)
    for k in range(nchunks):
        start = k * size
        if start >= used:
            break
        # dynamic_slice clamps out-of-range starts; request the clamped
        # start explicitly and shift the copy so words land at their true
        # stream offsets
        a0 = min(start, max(cap - size, 0))
        chunk = np.asarray(sl(words, jnp.int32(a0)))
        off = start - a0
        n_copy = min(size - off, used - start)
        buf[start : start + n_copy] = chunk[off : off + n_copy]
        avail = start + n_copy
        b_ready = int(np.searchsorted(end_words, avail - 2, side="right"))
        t = state["thread"]
        if t is not None:
            t.join()
        t = threading.Thread(target=decode_upto, args=(b_ready,))
        t.start()
        state["thread"] = t
    t = state["thread"]
    if t is not None:
        t.join()
    decode_upto(nb)  # tail blocks (buffer is fully resident + zero spare)

    out = np.empty((n_frames, n_out), np.float32)
    qmax = (1 << bits) - 1
    rngv = np.float32(hi) - np.float32(lo)
    scale = np.float32(qmax) / rngv if rngv > 0 else np.float32(1.0)
    _dequant_mt(
        lib, qp, n_out, f_pad, n_frames, float(np.float32(lo)),
        float(scale), out.ctypes.data_as(c.POINTER(c.c_float)), nt,
    )
    return out


# ---------------------------------------------------------------------------
# v2 uplink codec: per-block predictors + patched-width residual coding.
#
# Two measured inefficiencies of the v1 stream (fixed-predictor Delta^k,
# per-1024-block max-width fields):
#
#   * the PREDICTOR: Delta^k whitens tonal audio poorly (and k >= 3 LOSES:
#     differencing amplifies the broadband noise floor by ~2x variance per
#     order — measured 13.1/14.1 bits/sample for k=3/4 vs 12.0 for k=1 on
#     the bench signal).  A per-block quantized all-pole predictor
#     (FLAC-style int-LPC, order 8) tracks harmonic content instead:
#     measured 9.26 vs 9.99 bits/sample on samples/sample_44k1.wav.
#   * the RESIDUAL CODE: one outlier forces every sample in its block to
#     the outlier's width.  Patched coding stores each block at a chosen
#     width L and the few samples that do not fit as (position, high-bits)
#     exceptions, applied on device by one tiny scatter-add: measured
#     11.31 vs 11.94 bits/sample (delta1) on the bench signal.
#
# The stream stays BLOCK-aligned and decodes through the same gather-free
# scan/switch machinery as v1; every transform is mod-2^32 (wrapped int32
# products/sums, arithmetic shifts), so ANY int32 stream round-trips
# bit-exactly and f32 rides the same ordered-int mapping.  The per-segment
# winner is chosen by exact byte cost across {Delta^0..2, LPC} x
# {plain-max, patched}; a plain-max Delta winner ships as a v1 PackedPCM
# (native packer, 171 MB/s), so v2 only ever REPLACES v1 when it measures
# smaller.
# ---------------------------------------------------------------------------

LPC_P = 8          # predictor order (measured knee: p=4..8; 16 pays meta)
LPC_PREC = 14      # coefficient bits (FLAC-typical; products wrap mod 2^32)
_EXC_BITS = 64     # exception cost on the wire: i32 position + u32 payload


class PackedPCM2:
    """Host-side container for one v2-packed segment."""

    __slots__ = ("pred", "order", "n", "head", "words", "block_w",
                 "block_start", "out_dtype", "shift", "exc_idx", "exc_val",
                 "lpc_cq", "lpc_shift", "lpc_warmup")

    def __init__(self, pred, order, n, head, words, block_w, block_start,
                 out_dtype, shift, exc_idx, exc_val, lpc_cq, lpc_shift,
                 lpc_warmup):
        self.pred = pred            # 'delta' | 'lpc'
        self.order = order          # delta order (pred='delta')
        self.n = n
        self.head = head            # int32[order] warmup (delta)
        self.words = words          # uint32[W] packed low-bits stream
        self.block_w = block_w      # int32[NB] chosen width L per block
        self.block_start = block_start
        self.out_dtype = out_dtype  # 'int16' | 'int32' | 'f32'
        self.shift = shift          # f32 only: stripped mantissa planes
        self.exc_idx = exc_idx      # int32[E] global field positions
        self.exc_val = exc_val      # uint32[E] zigzag high parts (shifted)
        self.lpc_cq = lpc_cq        # int16[NB, P] coeffs (pred='lpc')
        self.lpc_shift = lpc_shift  # int32[NB]
        self.lpc_warmup = lpc_warmup  # int32[NB, P] first P samples/block

    @property
    def nbytes(self):
        total = (self.words.nbytes + self.block_w.nbytes +
                 self.block_start.nbytes + self.head.nbytes +
                 self.exc_idx.nbytes + self.exc_val.nbytes)
        if self.pred == "lpc":
            total += (self.lpc_cq.nbytes + self.lpc_shift.nbytes +
                      self.lpc_warmup.nbytes)
        return total


def _batched_lpc_quant(xb: np.ndarray):
    """Per-block quantized LPC: (NB, BLOCK) float -> (cq (NB,P) int32,
    shift (NB,) int32).  Batched Levinson-Durbin in float64 (the ops/lpc.py
    recursion, vectorized over blocks), FLAC-style coefficient
    quantization: shift chosen so max|c| uses LPC_PREC-1 magnitude bits."""
    p = LPC_P
    nb = xb.shape[0]
    ac = np.stack(
        [(xb[:, : BLOCK - k] * xb[:, k:]).sum(axis=1) for k in range(p + 1)],
        axis=1,
    )
    ac[:, 0] += 1e-3  # white-noise regularization: silence stays stable
    a = np.zeros((nb, p + 1))
    a[:, 0] = 1.0
    e = ac[:, 0].copy()
    for i in range(1, p + 1):
        acc = ac[:, i].copy()
        for j in range(1, i):
            acc += a[:, j] * ac[:, i - j]
        k = -acc / np.maximum(e, 1e-9)
        a2 = a.copy()
        for j in range(1, i):
            a2[:, j] = a[:, j] + k * a[:, i - j]
        a2[:, i] = k
        a = a2
        e = np.maximum(e * (1.0 - k * k), 1e-12)
    c = -a[:, 1:]
    mx = np.maximum(np.abs(c).max(axis=1), 1e-9)
    shift = np.clip(
        (LPC_PREC - 1) - np.ceil(np.log2(mx)).astype(np.int64), 0, 15
    ).astype(np.int32)
    cq = np.clip(
        np.round(c * np.exp2(shift)[:, None]),
        -(1 << (LPC_PREC - 1)),
        (1 << (LPC_PREC - 1)) - 1,
    ).astype(np.int32)
    return cq, shift


def _lpc_residual(xi: np.ndarray, cq: np.ndarray, shift: np.ndarray):
    """Wrapped int32 LPC residual per block.  xi (NB, BLOCK) int64 holds
    the (int32-ranged) samples; prediction for t >= P is
    asr(wrap32(sum_k cq[k-1] * x[t-k]), shift) — both sides of the codec
    compute this identically, so overflow only costs bits, never
    correctness.  Warmup positions t < P get residual 0 (their samples
    ship raw in lpc_warmup)."""
    p = LPC_P
    nb = xi.shape[0]
    acc = np.zeros((nb, BLOCK - p), np.int64)
    for k in range(1, p + 1):
        acc += cq[:, k - 1 : k].astype(np.int64) * xi[:, p - k : BLOCK - k]
    pred = (acc & 0xFFFFFFFF).astype(np.uint32).view(np.int32).reshape(
        nb, BLOCK - p
    ) >> shift[:, None]
    r = np.zeros((nb, BLOCK), np.int32)
    r[:, p:] = (
        (xi[:, p:] - pred.astype(np.int64)) & 0xFFFFFFFF
    ).astype(np.uint32).view(np.int32).reshape(nb, BLOCK - p)
    return r


def _plan_pfor(z: np.ndarray, penalty_bits: int):
    """Patched-width plan for a zigzag stream z (NB*BLOCK uint32):
    per-block width L minimizing L*BLOCK + penalty*#{z >= 2^L}, plus the
    exception count per block.  Returns (L (NB,) i64, nexc (NB,) i64,
    total_bits)."""
    nb = len(z) // BLOCK
    # bit length per sample (exact: float64 log2 below 2^53)
    bl = np.zeros(len(z), np.int64)
    nz = z != 0
    bl[nz] = np.floor(
        np.log2(z[nz].astype(np.float64))
    ).astype(np.int64) + 1
    # counts[b, w] = #samples in block b with bit length w
    counts = np.zeros((nb, 34), np.int64)
    np.add.at(
        counts.reshape(-1), (np.arange(len(z)) // BLOCK) * 34 + bl, 1
    )
    # nexc_L = #samples with bl > L  (suffix sums over w)
    suffix = counts[:, ::-1].cumsum(axis=1)[:, ::-1]
    nexc_all = np.zeros((nb, 33), np.int64)
    nexc_all[:, :33] = suffix[:, 1:34]  # exceptions if L = w
    cost = (
        np.arange(33, dtype=np.int64)[None, :] * BLOCK
        + penalty_bits * nexc_all
    )
    L = cost.argmin(axis=1)
    nexc = nexc_all[np.arange(nb), L]
    return L, nexc, int(cost[np.arange(nb), L].sum())


def _build_exceptions(z: np.ndarray, L: np.ndarray):
    """Exception arrays for a plan: positions where z >= 2^L(block) and
    the high parts (z minus its low L bits — already shifted, so the
    decoder just scatter-ADDS them)."""
    nb = len(z) // BLOCK
    Lf = np.repeat(L, BLOCK).astype(np.int64)
    hi = (z.astype(np.int64) >> Lf) << Lf
    idx = np.flatnonzero(hi != 0)
    return idx.astype(np.int32), hi[idx].astype(np.uint32)


def _exc_cap_ladder(n_vals: int):
    """Static exception-capacity buckets (program-cache discipline: the
    scatter operand shape must come from a tiny family)."""
    caps = sorted({0, -(-n_vals // 4096), -(-n_vals // 1024),
                   -(-n_vals // 256)})
    return [c for c in caps if c >= 0]


def pack_int2(x: np.ndarray, native: bool | None = None):
    """v2 packer: best of {Delta^0..2, block-LPC} x {plain, patched}
    by exact byte cost.  Returns PackedPCM2, a v1 PackedPCM (when the
    plain Delta form wins — it then ships through the fast native v1
    packer), or None when raw is smallest."""
    if x.dtype == np.int32:
        out_dtype = "int32"
        x = np.ascontiguousarray(x)
    else:
        out_dtype = "int16"
        x = np.ascontiguousarray(x, dtype=np.int16)
    n = len(x)
    if n <= 2 * BLOCK:
        return None
    xi = x.astype(np.int32)
    nb = -(-n // BLOCK)
    n_vals = nb * BLOCK

    def padded_z(r):
        z = np.zeros(n_vals, np.uint32)
        z[: len(r)] = _zigzag(r)
        return z

    ladder = _exc_cap_ladder(n_vals)
    meta_bits = nb * 8 * 8 + 64 * 8  # block_w/start i32 pairs + fixed

    candidates = []  # (cost_bits, kind, payload)
    r = xi
    heads = []
    for order in range(3):
        z = padded_z(r)
        L_plain, _, bits_plain = _plan_pfor(z, 1 << 30)
        candidates.append(
            (bits_plain + meta_bits, "delta_plain", (order, None, None))
        )
        for pen in (_EXC_BITS, 2 * _EXC_BITS, 4 * _EXC_BITS):
            L, nexc, bits = _plan_pfor(z, pen)
            tot = int(nexc.sum())
            cap = next((c for c in ladder if c >= tot), None)
            if cap is None:
                continue
            candidates.append(
                (bits + cap * _EXC_BITS - tot * pen + meta_bits,
                 "delta_pfor", (order, z, (L, cap)))
            )
            break  # first penalty whose plan fits its cap
        if order < 2:
            heads.append(r[0])
            r = np.diff(r)

    # LPC candidate (always patched-eligible; warmup/coeff meta included)
    xpad = np.zeros(n_vals, np.int64)
    xpad[:n] = xi
    xb = xpad.reshape(nb, BLOCK)
    cq, shift = _batched_lpc_quant(xb.astype(np.float64))
    rl = _lpc_residual(xb, cq, shift)
    zl = _zigzag(rl.reshape(-1))
    wu_bytes = 2 if out_dtype == "int16" else 4
    lpc_meta = meta_bits + nb * (LPC_P * 2 + LPC_P * wu_bytes + 4) * 8
    Lp, _, bits_lp = _plan_pfor(zl, 1 << 30)
    candidates.append((bits_lp + lpc_meta, "lpc_plain", (zl, None)))
    for pen in (_EXC_BITS, 2 * _EXC_BITS, 4 * _EXC_BITS):
        L, nexc, bits = _plan_pfor(zl, pen)
        tot = int(nexc.sum())
        cap = next((c for c in ladder if c >= tot), None)
        if cap is None:
            continue
        candidates.append(
            (bits + cap * _EXC_BITS - tot * pen + lpc_meta, "lpc_pfor",
             (zl, (L, cap)))
        )
        break

    cost, kind, payload = min(candidates, key=lambda t: t[0])
    if cost // 8 >= x.nbytes:
        return None
    if kind == "delta_plain":
        # the v1 stream IS this plan: ship it through the v1 packer
        return pack_int(x, native=native)

    def finish(z, plan, pred, order, cq=None, shift=None, warmup=None):
        L, cap = plan
        if plan[0] is None:
            L, _, _ = _plan_pfor(z, 1 << 30)
            cap = 0
        widths = L.astype(np.int32)
        if cap:
            exc_idx, exc_val = _build_exceptions(z, L)
            # uint64 mask math: L = 32 (full-width block) must yield an
            # all-ones mask, and 1 << 32 is UB in uint32
            mask = (
                (np.uint64(1) << np.repeat(L, BLOCK).astype(np.uint64))
                - np.uint64(1)
            ).astype(np.uint32)
            z = z & mask
            exc_idx = np.pad(exc_idx, (0, cap - len(exc_idx)))
            exc_val = np.pad(exc_val, (0, cap - len(exc_val)))
        else:
            exc_idx = np.zeros(0, np.int32)
            exc_val = np.zeros(0, np.uint32)
        data, starts = _pack_bits(z, widths)
        if starts.size and int(starts[-1] + widths[-1] * BLOCK) >= 2 ** 31:
            return None
        pad = (-len(data)) % 4 + 8
        words = np.pad(data, (0, pad)).view("<u4")
        return PackedPCM2(
            pred=pred, order=order, n=n,
            head=np.asarray(heads[:order], np.int32),
            words=np.ascontiguousarray(words), block_w=widths,
            block_start=starts.astype(np.int32), out_dtype=out_dtype,
            shift=0, exc_idx=exc_idx, exc_val=exc_val,
            lpc_cq=cq, lpc_shift=shift, lpc_warmup=warmup,
        )

    if kind == "delta_pfor":
        order, z, plan = payload
        return finish(z.copy(), plan, "delta", order)
    zl, plan = payload
    # coeffs + warmup ship narrow (LPC_PREC=14 fits i16; warmup in the
    # carrier width); the unpackers widen to int32 after the wire
    warmup = xb[:, :LPC_P].astype(
        np.int16 if out_dtype == "int16" else np.int32
    )
    if plan is None:
        plan = (None, None)
    return finish(zl.copy(), plan, "lpc", 0, cq.astype(np.int16), shift,
                  warmup)


def pack2_f32(x: np.ndarray, native: bool | None = None):
    """v2 for float32 streams: ordered-int transform (see pack_f32), then
    pack_int2.  Returns PackedPCM2 / PackedPCM / None."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    if len(x) <= 2 * BLOCK:
        return None
    o, t = _f32_to_ordered(x)
    p = pack_int2(o, native=native)
    if p is None:
        return None
    p.out_dtype = "f32"
    p.shift = t
    return p


def unpack2_np(p) -> np.ndarray:
    """Host-side reference unpack for PackedPCM2 (oracle for the device
    version); also accepts v1 PackedPCM (delegates)."""
    if isinstance(p, PackedPCM):
        return unpack_np(p)
    nb = len(p.block_w)
    i = np.arange(nb * BLOCK, dtype=np.int64)
    b = i >> _LOG2_BLOCK
    w = p.block_w[b].astype(np.int64)
    pos = p.block_start[b].astype(np.int64) + (i & (BLOCK - 1)) * w
    widx = pos >> 5
    sh = pos & 31
    lo = p.words[widx].astype(np.uint64)
    hi = p.words[widx + 1].astype(np.uint64)
    shu = sh.astype(np.uint64)
    up = np.where(sh > 0, (hi << ((64 - shu) & 63)) >> 32, 0)
    f = (lo >> shu) | up
    z = (f & ((np.uint64(1) << w.astype(np.uint64)) - 1)).astype(np.uint32)
    if len(p.exc_idx):
        np.add.at(z, p.exc_idx.astype(np.int64), p.exc_val)
    r = ((z >> np.uint32(1)).astype(np.int32)
         ^ -(z & np.uint32(1)).astype(np.int32))
    if p.pred == "lpc":
        pp = LPC_P
        r2 = r.reshape(nb, BLOCK).astype(np.int64)
        xb = np.zeros((nb, BLOCK), np.int64)
        xb[:, :pp] = p.lpc_warmup.astype(np.int64)
        cq = p.lpc_cq.astype(np.int64)
        for t in range(pp, BLOCK):
            acc = (cq * xb[:, t - pp : t][:, ::-1]).sum(axis=1)
            pred = (acc & 0xFFFFFFFF).astype(np.uint32).view(
                np.int32) >> p.lpc_shift
            xb[:, t] = (
                (r2[:, t] + pred) & 0xFFFFFFFF
            ).astype(np.uint32).view(np.int32)
        x = xb.reshape(-1)[: p.n].astype(np.int32)
    else:
        nr = p.n - p.order
        x = r[:nr].astype(np.int32)
        for head_v in p.head[::-1]:
            x = np.concatenate(
                [[head_v], head_v + np.cumsum(x, dtype=np.int32)]
            )
    if p.out_dtype == "f32":
        return _ordered_to_f32(x, p.shift)
    return x.astype(np.int16 if p.out_dtype == "int16" else np.int32)


@functools.partial(
    __import__("jax").jit,
    static_argnames=("n", "n_blocks", "out_dtype", "use_lpc", "n_exc"),
)
def unpack2_device(words, block_w, block_start, head, order, shift,
                   exc_idx, exc_val, lpc_cq, lpc_shift, lpc_warmup, *, n,
                   n_blocks, out_dtype="int16", use_lpc=False, n_exc=0):
    """Device unpack for the v2 stream -> int/f32[n].

    The dense low-bits field decode is the v1 scan/switch machinery
    unchanged; v2 adds (a) ONE scatter-add applying the (bucket-padded,
    no-op-on-zero) exceptions to the zigzag stream, and (b) for
    ``use_lpc`` (static: delta and LPC packs are separate program
    families) a per-block all-pole reconstruct — a (BLOCK - P)-step scan
    whose carry is the (n_blocks, P) sample history, vectorized across
    every block at once (block warmups ship raw, so blocks never chain).
    All integer ops wrap mod 2^32, matching the packer exactly.
    """
    import jax
    import jax.numpy as jnp

    z = _decode_dense(words, block_w, block_start, n_blocks)
    if n_exc:
        # padded tail entries are (idx 0, val 0): adding 0 is a no-op
        z = z.at[exc_idx].add(exc_val)
    r = jax.lax.bitcast_convert_type(
        (z >> jnp.uint32(1)) ^ (jnp.uint32(0) - (z & jnp.uint32(1))),
        jnp.int32,
    )

    if use_lpc:
        p = LPC_P
        r2 = r.reshape(n_blocks, BLOCK)
        # i16 wire carriers widen on device (products need int32 wrap)
        cq_rev = lpc_cq[:, ::-1].astype(jnp.int32)
        warm32 = lpc_warmup.astype(jnp.int32)

        def lstep(hist, rt):
            # wrapped int32 products/sums == wrap32 of the true sum
            pred = (cq_rev * hist).sum(axis=1) >> lpc_shift
            xt = rt + pred
            return jnp.concatenate([hist[:, 1:], xt[:, None]], axis=1), xt

        _, xs = jax.lax.scan(lstep, warm32, r2[:, p:].T)
        x = jnp.concatenate([warm32, xs.T], axis=1).reshape(-1)[:n]
    else:
        def inv0(_):
            return r[:n]

        def inv1(_):
            return jnp.concatenate(
                [head[0:1], head[0] + jnp.cumsum(r[: n - 1], dtype=jnp.int32)]
            )

        def inv2(_):
            d1 = jnp.concatenate(
                [head[1:2],
                 head[1] + jnp.cumsum(r[: n - 2], dtype=jnp.int32)]
            )
            return jnp.concatenate(
                [head[0:1], head[0] + jnp.cumsum(d1, dtype=jnp.int32)]
            )

        x = jax.lax.switch(jnp.clip(order, 0, 2), [inv0, inv1, inv2], None)
    if out_dtype == "int16":
        return x.astype(jnp.int16)
    if out_dtype == "int32":
        return x
    sign = x < 0
    mp = jax.lax.bitcast_convert_type(jnp.where(sign, ~x, x), jnp.uint32)
    b = (mp << shift.astype(jnp.uint32)) | (
        sign.astype(jnp.uint32) << jnp.uint32(31)
    )
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def unpack2_jax(p):
    """Unpack a PackedPCM2 on the default device (v1 packs delegate to
    unpack_jax).  Word-length bucketing as v1; the exception capacity is
    already a static ladder value, so the jit family stays tiny."""
    if isinstance(p, PackedPCM):
        return unpack_jax(p)
    import jax.numpy as jnp

    itemsize = 2 if p.out_dtype == "int16" else 4
    nbw = _bucket_words(len(p.words), p.n, itemsize)
    words = p.words
    if nbw > len(words):
        words = np.pad(words, (0, nbw - len(words)))
    head = np.zeros(2, np.int32)
    head[: len(p.head)] = p.head
    use_lpc = p.pred == "lpc"
    dummy2 = np.zeros((1, LPC_P), np.int32)
    return unpack2_device(
        jnp.asarray(words),
        jnp.asarray(p.block_w),
        jnp.asarray(p.block_start),
        jnp.asarray(head),
        jnp.int32(p.order),
        jnp.int32(p.shift),
        jnp.asarray(p.exc_idx),
        jnp.asarray(p.exc_val),
        jnp.asarray(p.lpc_cq if use_lpc else dummy2),
        jnp.asarray(p.lpc_shift if use_lpc else np.zeros(1, np.int32)),
        jnp.asarray(p.lpc_warmup if use_lpc else dummy2),
        n=p.n,
        n_blocks=len(p.block_w),
        out_dtype=p.out_dtype,
        use_lpc=use_lpc,
        n_exc=len(p.exc_idx),
    )


def _ensure_v2_types(lib):
    import ctypes as c

    if getattr(_ensure_v2_types, "_typed", False):
        return True
    if not hasattr(lib, "msv_wirepack2_pack"):
        return False
    pp = c.POINTER
    args = [
        pp(c.c_int16), c.c_int64, c.c_int32,
        pp(pp(c.c_uint8)), pp(c.c_int64),
        pp(pp(c.c_int32)), pp(pp(c.c_int32)), pp(c.c_int64),
        pp(c.c_int32), pp(c.c_int32), pp(c.c_int32),
        pp(pp(c.c_int32)), pp(pp(c.c_uint32)), pp(c.c_int64),
        pp(pp(c.c_int32)), pp(pp(c.c_int32)), pp(pp(c.c_int32)),
    ]
    lib.msv_wirepack2_pack.argtypes = args
    lib.msv_wirepack2_pack.restype = c.c_int32
    lib.msv_wirepack2_pack_i32.argtypes = [pp(c.c_int32)] + args[1:]
    lib.msv_wirepack2_pack_i32.restype = c.c_int32
    _ensure_v2_types._typed = True
    return True


def _pack_int2_native(x: np.ndarray, out_dtype: str):
    """C v2 packer (native/wirepack2.cc).  Returns (handled, packed):
    handled=False when the lib lacks v2 (caller falls back); packed=None
    when raw is smaller.  A delta-plain winner comes back as a v1
    PackedPCM so it decodes through the existing v1 program."""
    import ctypes as c

    lib = _native_lib()
    if lib is None or not _ensure_v2_types(lib):
        return False, None
    pp = c.POINTER
    out_bytes = pp(c.c_uint8)()
    out_nbytes = c.c_int64()
    out_widths = pp(c.c_int32)()
    out_starts = pp(c.c_int32)()
    out_nblocks = c.c_int64()
    out_pred = c.c_int32()
    out_order = c.c_int32()
    head_buf = (c.c_int32 * 2)()
    out_exc_idx = pp(c.c_int32)()
    out_exc_val = pp(c.c_uint32)()
    out_nexc = c.c_int64()
    out_cq = pp(c.c_int32)()
    out_shift = pp(c.c_int32)()
    out_warmup = pp(c.c_int32)()
    fn = (lib.msv_wirepack2_pack_i32 if x.dtype == np.int32
          else lib.msv_wirepack2_pack)
    xt = c.POINTER(c.c_int32 if x.dtype == np.int32 else c.c_int16)
    rc = fn(
        x.ctypes.data_as(xt), len(x), BLOCK,
        c.byref(out_bytes), c.byref(out_nbytes), c.byref(out_widths),
        c.byref(out_starts), c.byref(out_nblocks), c.byref(out_pred),
        c.byref(out_order), head_buf, c.byref(out_exc_idx),
        c.byref(out_exc_val), c.byref(out_nexc), c.byref(out_cq),
        c.byref(out_shift), c.byref(out_warmup),
    )
    if rc != 0:
        return True, None  # raw is smaller
    try:
        nb = out_nblocks.value
        nexc = out_nexc.value
        pred = out_pred.value
        order = out_order.value
        data = np.ctypeslib.as_array(
            out_bytes, shape=(out_nbytes.value,)).copy()
        widths = np.ctypeslib.as_array(out_widths, shape=(nb,)).copy()
        starts = np.ctypeslib.as_array(out_starts, shape=(nb,)).copy()
        words = np.ascontiguousarray(data.view("<u4"))
        head = np.asarray(head_buf[:order], np.int32)
        if pred == 0:
            return True, PackedPCM(
                order=order, n=len(x), head=head, words=words,
                block_w=widths, block_start=starts, out_dtype=out_dtype,
            )
        exc_idx = (np.ctypeslib.as_array(out_exc_idx, shape=(nexc,)).copy()
                   if nexc else np.zeros(0, np.int32))
        exc_val = (np.ctypeslib.as_array(out_exc_val, shape=(nexc,)).copy()
                   if nexc else np.zeros(0, np.uint32))
        if pred == 2:
            cq = np.ctypeslib.as_array(
                out_cq, shape=(nb, LPC_P)).astype(np.int16)
            sh = np.ctypeslib.as_array(out_shift, shape=(nb,)).copy()
            wu = np.ctypeslib.as_array(
                out_warmup, shape=(nb, LPC_P)).copy()
            if out_dtype == "int16":
                wu = wu.astype(np.int16)
        else:
            cq = sh = wu = None
        return True, PackedPCM2(
            pred="lpc" if pred == 2 else "delta", order=order, n=len(x),
            head=head, words=words, block_w=widths, block_start=starts,
            out_dtype=out_dtype, shift=0, exc_idx=exc_idx,
            exc_val=exc_val, lpc_cq=cq, lpc_shift=sh, lpc_warmup=wu,
        )
    finally:
        lib.msv_free_ptr(out_bytes)
        lib.msv_free_ptr(out_widths)
        lib.msv_free_ptr(out_starts)
        if out_nexc.value:
            lib.msv_free_ptr(out_exc_idx)
            lib.msv_free_ptr(out_exc_val)
        if out_pred.value == 2:
            lib.msv_free_ptr(out_cq)
            lib.msv_free_ptr(out_shift)
            lib.msv_free_ptr(out_warmup)


def pack_best(x: np.ndarray, native: bool | None = None):
    """Best available lossless pack for an int16/int32/f32 stream: the C
    v2 packer when built (the production path), else the v1 native
    packer, else the numpy v1 packer.  Returns PackedPCM2 / PackedPCM /
    None (raw)."""
    if x.dtype == np.float32:
        if len(x) <= 2 * BLOCK:
            return None
        o, t = _f32_to_ordered(x)
        p = pack_best(o, native=native)
        if p is None:
            return None
        p.out_dtype = "f32"
        p.shift = t
        return p
    if x.dtype not in (np.int16, np.int32):
        raise ValueError(f"pack_best: unsupported dtype {x.dtype}")
    x = np.ascontiguousarray(x)
    if native is not False:
        handled, p = _pack_int2_native(
            x, "int32" if x.dtype == np.int32 else "int16")
        if handled:
            return p
    return pack_int(x, native=native)
