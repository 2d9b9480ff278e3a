"""Streaming long-file spectrogram on one chip (SURVEY.md §5.g).

The reference materializes ALL frames at once (lib.rs:436) — fine for 44 s
clips, fatal for the hour-scale north star: 1 h @ 48 kHz is ~360k frames,
and the frame tensor alone would be ~2.8 GB with another ~3 GB of rfft
intermediates.  Here the waveform stays resident in HBM and a lax.scan
walks overlapped chunks: each step frames chunk_frames frames, runs the
windowed-DFT + mel GEMMs, and emits dB rows; peak intermediate memory is
one chunk (~tens of MB) regardless of file length, and XLA double-buffers
the scan naturally.  Running min/max ride the carry — the global dB range
costs no second pass.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_precision_mode
from ..ops.decibel import amp_to_db
from ..ops.framing import n_frames_for, reflect_pad_center


@functools.partial(
    jax.jit,
    static_argnames=("win", "hop", "n_fft", "chunk_frames", "n_chunks",
                     "use_mel", "impl", "mode"),
)
def _streaming_core(
    padded, c, s, window, mel_fb, n_valid, scale, *, win, hop, n_fft,
    chunk_frames, n_chunks, use_mel, impl, mode
):
    # ``mode`` is STATIC: reading the global inside the trace would bake the
    # trace-time precision into the cached executable (set_precision_mode
    # would silently stop working for compiled shapes).
    from ..config import precision_for

    chunk_len = chunk_frames * hop + (win - hop)
    # fast mode = DEFAULT (single-pass) MXU precision on f32 operands; see
    # kernels/pipeline.py for why explicit bf16 input casts are avoided.
    prec = precision_for(mode)
    cc, ss, fb = c, s, mel_fb
    if padded.dtype in (jnp.int16, jnp.int32):
        # integer transfer format (fewer tunnel bytes, wirepack-
        # compressible): exact power-of-two scale, TRACED so every carrier
        # shift (2^-15 PCM16, 2^-(bps-1) FLAC, 2^-s scaled-int floats)
        # shares one compiled program.
        padded = padded.astype(jnp.float32) * jnp.float32(scale)

    # Framing decomposition: with g = gcd(win, hop) the chunk reshapes to
    # g-wide rows and frame t-th pieces are stride-(hop/g) row slices —
    # zero-gather, dense on TPU.  For win % hop == 0 this reduces to the
    # classic t_overlap slice-concat.  A degenerate gcd (tiny g => win/g
    # slices would bloat the trace) falls back to gather framing, which
    # still keeps the streaming engine's O(chunk) memory (the reason
    # lib.rs:367-386-general params must not bypass it at hour scale).
    import math

    g = math.gcd(win, hop)
    n_slices = win // g
    rph = hop // g

    def step(carry, i):
        gmin, gmax = carry
        start = i * (chunk_frames * hop)
        x = jax.lax.dynamic_slice(padded, (start,), (chunk_len,))
        if n_slices <= 64:
            n_rows = chunk_len // g
            x2d = x[: n_rows * g].reshape(n_rows, g)
            frames = jnp.concatenate(
                [x2d[t : t + (chunk_frames - 1) * rph + 1 : rph]
                 for t in range(n_slices)],
                axis=1,
            )
        else:
            idx = ((jnp.arange(chunk_frames) * hop)[:, None]
                   + jnp.arange(win)[None, :])
            frames = x[idx]
        if impl == "fft":
            # XLA's native rfft: ~an order of magnitude fewer FLOPs than the
            # DFT GEMM at these sizes and f32-accurate (no MXU rounding).
            # |X| is invariant to the zero-pad placement, so a plain
            # right-pad replaces the centered (floor, ceil) pad.
            wf = frames * window[None, :]
            if n_fft > win:
                wf = jnp.pad(wf, ((0, 0), (0, n_fft - win)))
            mag = jnp.abs(jnp.fft.rfft(wf, axis=-1))
        else:
            re = jnp.dot(
                frames, cc, precision=prec, preferred_element_type=jnp.float32
            )
            im = jnp.dot(
                frames, ss, precision=prec, preferred_element_type=jnp.float32
            )
            mag = jnp.sqrt(re * re + im * im)
        if use_mel:
            mag = jnp.dot(mag, fb, precision=prec, preferred_element_type=jnp.float32)
        db = amp_to_db(mag)
        gidx = i * chunk_frames + jnp.arange(chunk_frames)
        fmask = (gidx < n_valid)[:, None]
        gmax = jnp.maximum(gmax, jnp.max(jnp.where(fmask, db, -jnp.inf)))
        gmin = jnp.minimum(gmin, jnp.min(jnp.where(fmask, db, jnp.inf)))
        return (gmin, gmax), db

    (gmin, gmax), dbs = jax.lax.scan(
        step, (jnp.inf, -jnp.inf), jnp.arange(n_chunks)
    )
    n_out = dbs.shape[-1]
    return dbs.reshape(n_chunks * chunk_frames, n_out), gmin, gmax


def _seg_plan_for(n_frames: int, chunk_frames: int, seg_chunks: int):
    """Segment-size ladder: full-size segments while they fit, then ONE
    tail segment of the next power-of-two chunk count — bounds transfer
    waste for short files at <2x while keeping program variety at
    log2(seg_chunks)+1 compiled executables total."""
    n_chunks_needed = -(-max(n_frames, 1) // chunk_frames)
    seg_plan = []
    remaining = n_chunks_needed
    while remaining >= seg_chunks:
        seg_plan.append(seg_chunks)
        remaining -= seg_chunks
    if remaining > 0:
        tail = 1
        while tail < remaining:
            tail *= 2
        seg_plan.append(min(tail, seg_chunks))
    return seg_plan


def padded_slice(src, a: int, b: int, half: int, n: int, dtype=np.int16):
    """Samples [a, b) of the conceptual reflect-padded + zero-tailed signal,
    materializing only this segment (src may be an np.memmap or ndarray).

    Replaces whole-file reflect_pad + pad copies: at hour scale those are
    two ~350 MB passes on the single host core before the first byte can
    move; this touches each output byte once.
    """
    out = np.zeros(b - a, dtype=dtype)
    # left reflect region: padded[p] = wav[half - p] for p < half
    lo = a
    if lo < half:
        hi = min(b, half)
        src_l = np.asarray(src[half - lo : half - hi : -1] if half - hi > 0
                           else src[half - lo :: -1][: hi - lo])
        out[: hi - lo] = src_l
        lo = hi
    # middle: padded[p] = wav[p - half] for half <= p < half + n
    if lo < b and lo < half + n:
        hi = min(b, half + n)
        out[lo - a : hi - a] = src[lo - half : hi - half]
        lo = hi
    # right reflect: padded[p] = wav[n - 2 - (p - half - n)] while valid
    if lo < b and lo < half + n + half:
        hi = min(b, half + n + half)
        idx0 = n - 2 - (lo - half - n)
        idx1 = n - 2 - (hi - 1 - half - n)
        if idx0 >= 0:
            idx1c = max(idx1, 0)
            src_r = np.asarray(src[idx0 : idx1c - 1 if idx1c > 0 else None : -1])
            out[lo - a : lo - a + len(src_r)] = src_r
    return out  # anything beyond stays zero (bucket tail)


def _to_device_packed(seg_np, transfer: str):
    """Ship one segment host->device, bit-packed when it pays.

    'pack'/'auto': int16/int32/f32 segments go through the wirepack codec
    — fewer wire bytes (the binding constraint: ~25 MB/s sustained),
    unpacked on-device by vectorized integer ops into the identical
    buffer.  pack_best picks the v2 stream (per-block LPC / patched
    widths, native/wirepack2.cc) when it measures smaller, else the v1
    delta stream; raw whenever packing would not shrink the transfer.
    'pack1' pins the v1 codec (A/B harnesses).
    """
    if transfer in ("pack", "auto", "pack1"):
        if transfer == "pack1" or _WIRE_V1_ONLY:
            from .wirepack import pack_f32, pack_int, unpack_jax as _uj

            if seg_np.dtype in (np.int16, np.int32):
                p = pack_int(seg_np)
            elif seg_np.dtype == np.float32:
                p = pack_f32(seg_np)
            else:
                p = None
        elif seg_np.dtype in (np.int16, np.int32, np.float32):
            from .wirepack import pack_best, unpack2_jax as _uj

            p = pack_best(seg_np)
        else:
            p = None
        if p is not None:
            return _uj(p)
    return jnp.asarray(seg_np)


# test/A-B hook: force the v1 wire codec globally (see bench harnesses)
_WIRE_V1_ONLY = False


def _run_segments(
    make_seg, seg_plan, n_frames, win, hop, c, s, mel_fb, window, n_fft,
    chunk_frames, impl, transfer, keep_wav: bool = False,
    scale: float = 2.0**-15,
):
    """Software-pipelined segment runner.

    The relay executes its command stream in order, so the schedule is
    transfer(0), then for each k: dispatch scan(k) BEFORE materializing /
    packing / transferring segment k+1 — the wire streams k+1's bytes and
    the host packs them while the device runs scan k.  (Enqueuing all
    transfers up front serializes every byte ahead of the first scan:
    measured 18-27 s vs 10.3-10.9 s for the hour workload.)
    """
    use_mel = mel_fb is not None

    def to_dev(x):
        # device arrays pass through (avoids a device->host->device bounce)
        return x if isinstance(x, jax.Array) else jnp.asarray(np.asarray(x))

    c_d = to_dev(c)
    s_d = to_dev(s)
    w_d = to_dev(
        np.asarray(window, dtype=np.float32)
        if window is not None
        else np.zeros(win, np.float32)
    )
    fb_d = to_dev(mel_fb if use_mel else np.zeros((1, 1), np.float32))

    mode = get_precision_mode()
    outs = []
    devs = []  # device segments (kept when the caller wants the waveform)
    pending = None  # (device segment, start_frame, n_chunks)
    start_frame = 0
    plan = [*seg_plan, None]
    for nck in plan:
        if pending is not None:
            dev, f0, pnck = pending
            n_valid_g = max(0, min(n_frames - f0, pnck * chunk_frames))
            outs.append(
                _streaming_core(
                    dev, c_d, s_d, w_d, fb_d, jnp.int32(n_valid_g),
                    jnp.float32(scale),
                    win=win, hop=hop, n_fft=n_fft or win,
                    chunk_frames=chunk_frames, n_chunks=pnck,
                    use_mel=use_mel, impl=impl, mode=mode,
                )
            )
        if nck is None:
            break
        seg_frames_g = nck * chunk_frames
        seg_len = seg_frames_g * hop + (win - hop)
        seg_np = make_seg(start_frame * hop, seg_len)
        pending = (_to_device_packed(seg_np, transfer), start_frame, nck)
        if keep_wav:
            devs.append((pending[0], seg_frames_g))
        start_frame += seg_frames_g
    wav_dev = None
    if keep_wav:
        # stitch the already-on-device segments into the padded waveform:
        # consecutive segments overlap by (win - hop) samples, so all but
        # the last contribute their first seg_frames*hop samples.  The
        # waveform thus rides the SAME wire bytes as the spectrogram — an
        # envelope render afterwards costs no second ~350 MB transfer.
        pieces = [d[: fg * hop] for d, fg in devs[:-1]] + [devs[-1][0]]
        wav_dev = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    if len(outs) == 1:
        db, gmin, gmax = outs[0]
        out = (db, n_frames, float(gmin), float(gmax))
    else:
        db = jnp.concatenate([o[0] for o in outs], axis=0)
        mins = np.asarray(jnp.stack([o[1] for o in outs]))
        maxs = np.asarray(jnp.stack([o[2] for o in outs]))
        out = (db, n_frames, float(mins.min()), float(maxs.max()))
    return (*out, wav_dev) if keep_wav else out


def streaming_spec_db(
    wav: np.ndarray,
    win: int,
    hop: int,
    c: np.ndarray,
    s: np.ndarray,
    mel_fb=None,
    chunk_frames: int = 4096,
    n_fft: int | None = None,
    window: np.ndarray | None = None,
    impl: str = "dft",
    seg_chunks: int = 8,
    transfer: str = "auto",
    keep_wav: bool = False,
    scale: float = 2.0**-15,
):
    """Full-file dB spectrogram via segmented chunked scans.

    Returns (db (n_frames_padded, n_out) device, n_frames, min_db, max_db).
    Semantically identical to the one-shot pipeline (parity-tested); only
    the schedule differs.

    The file is cut into fixed segments of ``seg_chunks`` scan chunks,
    software-pipelined so the wire, the host packer, and the device all
    stay busy (see _run_segments), with int16 segments bit-packed for the
    transfer when that shrinks them (see wirepack.py; ``transfer`` =
    'auto' | 'pack' | 'raw').

    ``impl``: 'dft' (windowed-DFT GEMMs via XLA), 'fft' (XLA native rfft;
    requires ``n_fft`` and ``window``), or 'pallas' (the fused VMEM-resident
    kernel, kernels/spectrogram_pallas.py; requires mel + win % hop == 0).

    ``keep_wav=True`` appends a 5th return value: the device-resident
    reflect-padded waveform assembled from the transferred segments (the
    sample at padded index win//2 is the file's sample 0) — callers reuse
    it for envelope rendering instead of re-shipping the file.
    """
    # integer input is kept as the transfer format (scaled on device,
    # exact): int16 raw PCM or the int32 multi-channel sum
    dtype = wav.dtype if wav.dtype in (np.int16, np.int32) else np.float32
    wav = np.ascontiguousarray(wav, dtype=dtype)
    if impl == "fft" and (n_fft is None or window is None):
        raise ValueError("impl='fft' requires n_fft and window")
    if impl == "pallas":
        if mel_fb is None or win % hop != 0:
            raise ValueError("impl='pallas' requires mel_fb and win % hop == 0")
        if keep_wav:
            raise ValueError("keep_wav is not supported with impl='pallas'")
        if wav.dtype != np.int16 or scale != 2.0**-15:
            # the fused kernel's i16 DMA path bakes the 2^-15 scale; other
            # carriers take the (bit-identical) host-scaled f32 form
            if wav.dtype in (np.int16, np.int32):
                wav = wav.astype(np.float32) * np.float32(scale)
        return _streaming_pallas(wav, win, hop, c, s, mel_fb, chunk_frames,
                                 seg_chunks)
    n_frames = n_frames_for(len(wav), win, hop)
    seg_plan = _seg_plan_for(n_frames, chunk_frames, seg_chunks)
    half = win // 2

    def make_seg(a, seg_len):
        return padded_slice(wav, a, a + seg_len, half, len(wav), dtype=dtype)

    return _run_segments(
        make_seg, seg_plan, n_frames, win, hop, c, s, mel_fb, window, n_fft,
        chunk_frames, impl, transfer, keep_wav=keep_wav, scale=scale,
    )


def _streaming_pallas(wav, win, hop, c, s, mel_fb, chunk_frames, seg_chunks):
    """Segmented long-file pipeline on the fused Pallas kernel.

    Each segment runs kernels.spectrogram_pallas over its frame tiles —
    HBM sees the (lane-padded) waveform once and the mel rows once; the
    frames / rfft intermediates never leave VMEM.  Parity mode uses f32
    operands with HIGHEST dots; fast mode ships bf16 operand tiles.
    """
    from ..config import get_precision_mode
    from ..kernels.spectrogram_pallas import (
        TILE_F,
        mel_spectrogram_pallas,
        prepare_matrices,
        prepare_wav2d,
    )

    c, s, mel_fb = np.asarray(c), np.asarray(s), np.asarray(mel_fb)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    # int16 passes straight through: the kernel DMAs i16 chunks ((16, 128)
    # tiles) and applies the exact 2^-15 scale during frame assembly
    n_frames = n_frames_for(len(wav), win, hop)
    seg_frames = seg_chunks * chunk_frames
    assert seg_frames % TILE_F == 0
    n_chunks_needed = -(-max(n_frames, 1) // seg_frames)
    n_total = n_chunks_needed * seg_frames
    padded = reflect_pad_center(wav, win)
    need = n_total * hop + (win - hop)
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))

    c3, s3, fb3, n_mel = prepare_matrices(c, s, mel_fb, win)
    if get_precision_mode() == "fast":
        import ml_dtypes

        c3 = c3.astype(ml_dtypes.bfloat16)
        s3 = s3.astype(ml_dtypes.bfloat16)
        fb3 = fb3.astype(ml_dtypes.bfloat16)
    c3_d, s3_d, fb3_d = jnp.asarray(c3), jnp.asarray(s3), jnp.asarray(fb3)

    outs = []
    for g in range(n_chunks_needed):
        s0 = g * seg_frames * hop
        seg = padded[s0 : s0 + seg_frames * hop + (win - hop)]
        wav2d = prepare_wav2d(seg, win, hop, seg_frames)
        db_p = mel_spectrogram_pallas(
            jnp.asarray(wav2d),
            c3_d,
            s3_d,
            fb3_d,
            win=win,
            hop=hop,
            n_frames=seg_frames,
            interpret=interpret,
            mode=get_precision_mode(),
        )
        db = db_p[:, :n_mel]
        f0 = g * seg_frames
        n_valid_g = max(0, min(n_frames - f0, seg_frames))
        fmask = (jnp.arange(seg_frames) < n_valid_g)[:, None]
        smax = jnp.max(jnp.where(fmask, db, -jnp.inf))
        smin = jnp.min(jnp.where(fmask, db, jnp.inf))
        outs.append((db, smin, smax))
    if len(outs) == 1:
        db, gmin, gmax = outs[0]
        return db, n_frames, float(gmin), float(gmax)
    db = jnp.concatenate([o[0] for o in outs], axis=0)
    mins = np.asarray(jnp.stack([o[1] for o in outs]))
    maxs = np.asarray(jnp.stack([o[2] for o in outs]))
    return db, n_frames, float(mins.min()), float(maxs.max())


def streaming_spec_db_mmap(path, win, hop, c, s, mel_fb=None,
                           chunk_frames: int = 4096, seg_chunks: int = 8,
                           transfer: str = "auto"):
    """Disk-streamed long-file spectrogram: segments are sliced straight
    from a memory-mapped mono WAV (PCM16 or float32), so host resident
    memory is one segment (~30 MB) regardless of file size — a 10-hour
    file no longer needs 7 GB of RAM.  Semantics identical to
    streaming_spec_db (reflect-pad edges handled per segment;
    parity-tested), including the software-pipelined schedule and wire
    packing (int16 delta codec / f32 ordered-float codec per segment).
    """
    from ..io.audio import open_wav_mmap

    mm, sr = open_wav_mmap(path)
    n = len(mm)
    half = win // 2
    if n < half + 1:
        raise ValueError(f"{path}: too short for win_length={win}")
    n_frames = n_frames_for(n, win, hop)
    seg_plan = _seg_plan_for(n_frames, chunk_frames, seg_chunks)
    dtype = np.float32 if mm.dtype == np.float32 else np.int16

    def make_seg(a, seg_len):
        return padded_slice(mm, a, a + seg_len, half, n, dtype=dtype)

    return _run_segments(
        make_seg, seg_plan, n_frames, win, hop, c, s, mel_fb, None, None,
        chunk_frames, "dft", transfer,
    )
