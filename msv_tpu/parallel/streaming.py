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
    padded, c, s, window, mel_fb, n_valid, *, win, hop, n_fft, chunk_frames,
    n_chunks, use_mel, impl, mode
):
    # ``mode`` is STATIC: reading the global inside the trace would bake the
    # trace-time precision into the cached executable (set_precision_mode
    # would silently stop working for compiled shapes).
    from ..config import precision_for

    t_overlap = win // hop
    chunk_len = chunk_frames * hop + (win - hop)
    # fast mode = DEFAULT (single-pass) MXU precision on f32 operands; see
    # kernels/pipeline.py for why explicit bf16 input casts are avoided.
    prec = precision_for(mode)
    cc, ss, fb = c, s, mel_fb
    if padded.dtype == jnp.int16:
        # PCM16 transfer format (half the tunnel bytes): exact 2^-15 scale.
        padded = padded.astype(jnp.float32) * jnp.float32(2.0**-15)

    def step(carry, i):
        gmin, gmax = carry
        start = i * (chunk_frames * hop)
        x = jax.lax.dynamic_slice(padded, (start,), (chunk_len,))
        n_rows = chunk_frames + t_overlap - 1
        x2d = x[: n_rows * hop].reshape(n_rows, hop)
        frames = jnp.concatenate(
            [jax.lax.slice_in_dim(x2d, t, t + chunk_frames, axis=0)
             for t in range(t_overlap)],
            axis=1,
        )
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
):
    """Full-file dB spectrogram via segmented chunked scans.

    Returns (db (n_frames_padded, n_out) device, n_frames, min_db, max_db).
    Semantically identical to the one-shot pipeline (parity-tested); only
    the schedule differs.

    The file is cut into fixed segments of ``seg_chunks`` scan chunks, each
    dispatched as its own async transfer + scan: host->device transfer of
    segment g+1 overlaps compute of segment g (the hour-scale workload is
    transfer-bound over the axon tunnel), and ONE compiled program serves
    any file length (a monolithic scan recompiles per chunk count).

    ``impl``: 'dft' (windowed-DFT GEMMs via XLA), 'fft' (XLA native rfft;
    requires ``n_fft`` and ``window``), or 'pallas' (the fused VMEM-resident
    kernel, kernels/spectrogram_pallas.py; requires mel + win % hop == 0).
    """
    # int16 input is kept as the transfer format (scaled on device, exact)
    dtype = np.int16 if wav.dtype == np.int16 else np.float32
    wav = np.ascontiguousarray(wav, dtype=dtype)
    if impl == "fft" and (n_fft is None or window is None):
        raise ValueError("impl='fft' requires n_fft and window")
    if impl == "pallas":
        if mel_fb is None or win % hop != 0:
            raise ValueError("impl='pallas' requires mel_fb and win % hop == 0")
        return _streaming_pallas(wav, win, hop, c, s, mel_fb, chunk_frames,
                                 seg_chunks)
    n_frames = n_frames_for(len(wav), win, hop)
    # Segment-size ladder: full-size segments while they fit, then ONE
    # tail segment of the next power-of-two chunk count — bounds transfer
    # waste for short files at <2x while keeping program variety at
    # log2(seg_chunks)+1 compiled executables total.
    n_chunks_needed = -(-max(n_frames, 1) // chunk_frames)
    seg_plan = []  # list of per-segment chunk counts
    remaining = n_chunks_needed
    while remaining >= seg_chunks:
        seg_plan.append(seg_chunks)
        remaining -= seg_chunks
    if remaining > 0:
        tail = 1
        while tail < remaining:
            tail *= 2
        seg_plan.append(min(tail, seg_chunks))
    n_total = sum(seg_plan) * chunk_frames
    padded = reflect_pad_center(wav, win)
    need = n_total * hop + (win - hop)
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))

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

    # enqueue ALL segment transfers up front (device_put is async), then
    # dispatch the per-segment scans — later transfers ride behind compute.
    segs = []
    start_frame = 0
    for nck in seg_plan:
        seg_frames_g = nck * chunk_frames
        seg_len = seg_frames_g * hop + (win - hop)
        s0 = start_frame * hop
        segs.append((jnp.asarray(padded[s0 : s0 + seg_len]), start_frame, nck))
        start_frame += seg_frames_g
    outs = []
    for seg, f0, nck in segs:
        n_valid_g = max(0, min(n_frames - f0, nck * chunk_frames))
        outs.append(
            _streaming_core(
                seg,
                c_d,
                s_d,
                w_d,
                fb_d,
                jnp.int32(n_valid_g),
                win=win,
                hop=hop,
                n_fft=n_fft or win,
                chunk_frames=chunk_frames,
                n_chunks=nck,
                use_mel=use_mel,
                impl=impl,
                mode=get_precision_mode(),
            )
        )
    if len(outs) == 1:
        db, gmin, gmax = outs[0]
        return db, n_frames, float(gmin), float(gmax)
    db = jnp.concatenate([o[0] for o in outs], axis=0)
    mins = np.asarray(jnp.stack([o[1] for o in outs]))
    maxs = np.asarray(jnp.stack([o[2] for o in outs]))
    return db, n_frames, float(mins.min()), float(maxs.max())


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
                           chunk_frames: int = 4096, seg_chunks: int = 8):
    """Disk-streamed long-file spectrogram: segments are sliced straight
    from a memory-mapped mono-PCM16 WAV, so host resident memory is one
    segment (~30 MB) regardless of file size — a 10-hour file no longer
    needs 7 GB of RAM.  Semantics identical to streaming_spec_db
    (reflect-pad edges handled per segment; parity-tested).
    """
    from ..io.audio import open_wav_mmap

    mm, sr = open_wav_mmap(path)
    n = len(mm)
    half = win // 2
    if n < half + 1:
        raise ValueError(f"{path}: too short for win_length={win}")
    n_frames = n_frames_for(n, win, hop)
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

    use_mel = mel_fb is not None
    c_d = jnp.asarray(np.asarray(c))
    s_d = jnp.asarray(np.asarray(s))
    w_d = jnp.asarray(np.zeros(win, np.float32))
    fb_d = jnp.asarray(
        np.asarray(mel_fb) if use_mel else np.zeros((1, 1), np.float32)
    )

    def padded_slice(a, b):
        """Samples [a, b) of the conceptual reflect-padded + zero-tailed
        signal, materializing only this segment from the memmap."""
        out = np.zeros(b - a, dtype=np.int16)
        # left reflect region: padded[p] = wav[half - p] for p < half
        lo = a
        if lo < half:
            hi = min(b, half)
            src = np.asarray(mm[half - lo : half - hi : -1] if half - hi > 0
                             else mm[half - lo :: -1][: hi - lo])
            out[: hi - lo] = src
            lo = hi
        # middle: padded[p] = wav[p - half] for half <= p < half + n
        if lo < b and lo < half + n:
            hi = min(b, half + n)
            out[lo - a : hi - a] = mm[lo - half : hi - half]
            lo = hi
        # right reflect: padded[p] = wav[n - 2 - (p - half - n)] while valid
        if lo < b and lo < half + n + half:
            hi = min(b, half + n + half)
            idx0 = n - 2 - (lo - half - n)
            idx1 = n - 2 - (hi - 1 - half - n)
            if idx0 >= 0:
                idx1c = max(idx1, 0)
                src = np.asarray(mm[idx0 : idx1c - 1 if idx1c > 0 else None : -1])
                out[lo - a : lo - a + len(src)] = src
        return out  # anything beyond stays zero (bucket tail)

    outs = []
    start_frame = 0
    for nck in seg_plan:
        seg_frames_g = nck * chunk_frames
        seg_len = seg_frames_g * hop + (win - hop)
        a = start_frame * hop
        seg = padded_slice(a, a + seg_len)
        n_valid_g = max(0, min(n_frames - start_frame, seg_frames_g))
        outs.append(
            _streaming_core(
                jnp.asarray(seg),
                c_d,
                s_d,
                w_d,
                fb_d,
                jnp.int32(n_valid_g),
                win=win,
                hop=hop,
                n_fft=win,
                chunk_frames=chunk_frames,
                n_chunks=nck,
                use_mel=use_mel,
                impl="dft",
                mode=get_precision_mode(),
            )
        )
        start_frame += seg_frames_g
    if len(outs) == 1:
        db, gmin, gmax = outs[0]
        return db, n_frames, float(gmin), float(gmax)
    db = jnp.concatenate([o[0] for o in outs], axis=0)
    mins = np.asarray(jnp.stack([o[1] for o in outs]))
    maxs = np.asarray(jnp.stack([o[2] for o in outs]))
    return db, n_frames, float(mins.min()), float(maxs.max())
