"""Sequence-sharded + batch-sharded spectrogram pipeline (shard_map).

The full multi-chip "step": a batch of equal-length waveforms is sharded
(batch -> "dp", time -> "sp"); each device frames its local chunk after a
(win - hop)-sample halo exchange with its right neighbor over ICI
(jax.lax.ppermute), runs the windowed-DFT + mel GEMMs on local frames, and
the global dB min/max is an all-reduce (pmax/pmin) over BOTH mesh axes —
the TPU form of the reference's rayon reductions (lib.rs:194-207).

Frame-grid layout: the host supplies the reflect-padded signal P with
n_frames_total = n_sp * frames_per_shard and len(P) >= n_frames_total*hop +
(win - hop).  Device s owns P[s*L : (s+1)*L], L = frames_per_shard*hop, and
frame (s*fps + j) covers P[(s*fps + j)*hop : ... + win] — the last frame of
each shard reaches (win - hop) samples into the next shard: exactly the
halo.  The final shard's halo comes from a small replicated tail argument
instead of a neighbor.
"""


import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import get_precision_mode
from ..ops.decibel import amp_to_db


def _local_spec(chunk, halo, c, s, mel_fb, win, hop, fps, mode):
    """Frame a local chunk (+halo) and run the DFT/mel GEMM chain."""
    from ..config import precision_for

    x = jnp.concatenate([chunk, halo], axis=-1)  # (..., L + win - hop)
    t_overlap = win // hop
    n_rows = fps + t_overlap - 1
    x2d = x[..., : n_rows * hop].reshape(x.shape[:-1] + (n_rows, hop))
    parts = [
        jax.lax.slice_in_dim(x2d, t, t + fps, axis=-2) for t in range(t_overlap)
    ]
    frames = jnp.concatenate(parts, axis=-1)  # (..., fps, win)
    prec = precision_for(mode)
    re = jnp.dot(frames, c, precision=prec, preferred_element_type=jnp.float32)
    im = jnp.dot(frames, s, precision=prec, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    if mel_fb is not None:
        mag = jnp.dot(mag, mel_fb, precision=prec, preferred_element_type=jnp.float32)
    return amp_to_db(mag)


@functools.lru_cache(maxsize=64)
def make_sharded_spec_fn(mesh, *, win, hop, frames_per_shard, use_mel,
                         mode="parity"):
    """Build the jitted shard_map pipeline for one (win, hop, fps) bucket.

    lru-cached (mesh is hashable) with the precision mode in the key so
    repeated calls reuse the compiled executable and mode flips re-key it.

    Returns fn(wavs (B, n_sp*L), tail (B, win-hop), c, s, mel_fb, n_valid)
      -> (db (B, n_frames_total, n_out) sharded (dp, sp, None),
          min_db, max_db replicated scalars)
    """
    n_sp = mesh.shape["sp"]
    halo_len = win - hop
    fps = frames_per_shard

    def per_device(wav_l, tail, c, s, mel_fb, n_valid):
        # wav_l: (B_l, L) local shard;  tail: (B_l, halo) replicated over sp
        sp = jax.lax.axis_index("sp")
        if halo_len > 0:
            own_head = wav_l[:, :halo_len]
            # right neighbor's head -> our halo (ring shift left)
            perm = [((i + 1) % n_sp, i) for i in range(n_sp)]
            halo = jax.lax.ppermute(own_head, "sp", perm)
            halo = jnp.where(sp == n_sp - 1, tail, halo)
        else:
            halo = wav_l[:, :0]
        db = _local_spec(wav_l, halo, c, s, mel_fb if use_mel else None,
                         win, hop, fps, mode)
        # masked global min/max over valid frames (global frame index)
        gidx = sp * fps + jnp.arange(fps)
        fmask = (gidx < n_valid)[None, :, None]
        lmax = jnp.max(jnp.where(fmask, db, -jnp.inf))
        lmin = jnp.min(jnp.where(fmask, db, jnp.inf))
        gmax = jax.lax.pmax(jax.lax.pmax(lmax, "sp"), "dp")
        gmin = jax.lax.pmin(jax.lax.pmin(lmin, "sp"), "dp")
        return db, gmin, gmax

    shmapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("dp", "sp"),  # wav body
            P("dp", None),  # tail (replicated along sp)
            P(None, None),  # C
            P(None, None),  # S
            P(None, None),  # mel fb
            P(),  # n_valid scalar
        ),
        out_specs=(P("dp", "sp", None), P(), P()),
    )
    return jax.jit(shmapped)


def sharded_spec_pipeline(mesh, wavs, win, hop, c, s, mel_fb, n_valid_frames):
    """Host-facing wrapper: shard inputs onto the mesh and run the step.

    ``wavs``: (B, Lp) host array of reflect-padded signals; B must divide by
    mesh dp, and the function derives frames_per_shard from Lp.
    """
    import numpy as np

    n_sp = mesh.shape["sp"]
    halo = win - hop
    B, lp = wavs.shape
    # choose fps so that n_sp * fps * hop + halo <= Lp (pad host-side first)
    fps = (lp - halo) // (n_sp * hop)
    body_len = n_sp * fps * hop
    body = wavs[:, :body_len]
    tail = wavs[:, body_len : body_len + halo]
    if tail.shape[1] < halo:
        tail = np.pad(tail, ((0, 0), (0, halo - tail.shape[1])))

    fn = make_sharded_spec_fn(
        mesh, win=win, hop=hop, frames_per_shard=fps,
        use_mel=mel_fb is not None, mode=get_precision_mode(),
    )
    dev_body = jax.device_put(body, NamedSharding(mesh, P("dp", "sp")))
    dev_tail = jax.device_put(tail, NamedSharding(mesh, P("dp", None)))
    rep = NamedSharding(mesh, P(None, None))
    c_d = jax.device_put(np.asarray(c), rep)
    s_d = jax.device_put(np.asarray(s), rep)
    fb_d = jax.device_put(
        np.asarray(mel_fb) if mel_fb is not None else np.zeros((1, 1), np.float32),
        rep,
    )
    db, gmin, gmax = fn(
        dev_body, dev_tail, c_d, s_d, fb_d, jnp.int32(n_valid_frames)
    )
    return db, gmin, gmax, fps * n_sp


@functools.lru_cache(maxsize=64)
def make_sharded_streaming_fn(mesh, *, win, hop, chunk_frames, chunks_per_dev,
                              use_mel, mode="parity"):
    """Long-file spectrogram over the "sp" mesh axis: each device lax.scans
    its own contiguous run of chunks (frames_per_dev = chunks_per_dev *
    chunk_frames), after the (win - hop) halo exchange with its right
    neighbor — the multi-chip form of parallel/streaming.py.  With n chips
    the hour-scale wall divides by ~n (per-chip transfer and compute both
    shrink n-fold).

    Returns fn(body (n_sp*L,), tail (halo,), c, s, fb, n_valid)
      -> (db (n_frames_total, n_out) sharded over sp, min, max replicated).
    """
    n_sp = mesh.shape["sp"]
    halo_len = win - hop
    fpd = chunks_per_dev * chunk_frames
    t_overlap = win // hop

    def per_device(wav_l, tail, c, s, fb, n_valid):
        sp = jax.lax.axis_index("sp")
        if halo_len > 0:
            own_head = wav_l[:halo_len]
            perm = [((i + 1) % n_sp, i) for i in range(n_sp)]
            halo = jax.lax.ppermute(own_head, "sp", perm)
            halo = jnp.where(sp == n_sp - 1, tail, halo)
        else:
            halo = wav_l[:0]
        from ..config import precision_for

        x = jnp.concatenate([wav_l, halo])
        if x.dtype == jnp.int16:
            x = x.astype(jnp.float32) * jnp.float32(2.0**-15)
        prec = precision_for(mode)
        chunk_len = chunk_frames * hop + halo_len

        def step(_, i):
            seg = jax.lax.dynamic_slice(x, (i * chunk_frames * hop,), (chunk_len,))
            n_rows = chunk_frames + t_overlap - 1
            x2d = seg[: n_rows * hop].reshape(n_rows, hop)
            frames = jnp.concatenate(
                [jax.lax.slice_in_dim(x2d, t, t + chunk_frames, axis=0)
                 for t in range(t_overlap)],
                axis=1,
            )
            re = jnp.dot(frames, c, precision=prec,
                         preferred_element_type=jnp.float32)
            im = jnp.dot(frames, s, precision=prec,
                         preferred_element_type=jnp.float32)
            mag = jnp.sqrt(re * re + im * im)
            if use_mel:
                mag = jnp.dot(mag, fb, precision=prec,
                              preferred_element_type=jnp.float32)
            return _, amp_to_db(mag)

        # minmax after the scan: an sp-varying carry would mismatch the
        # invariant init under shard_map's varying-axis typing
        _, dbs = jax.lax.scan(step, 0, jnp.arange(chunks_per_dev))
        db = dbs.reshape(fpd, dbs.shape[-1])
        gidx = sp * fpd + jnp.arange(fpd)
        fmask = (gidx < n_valid)[:, None]
        lmax = jnp.max(jnp.where(fmask, db, -jnp.inf))
        lmin = jnp.min(jnp.where(fmask, db, jnp.inf))
        gmax = jax.lax.pmax(lmax, "sp")
        gmin = jax.lax.pmin(lmin, "sp")
        return db, gmin, gmax

    shmapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("sp"), P(None), P(None, None), P(None, None),
                  P(None, None), P()),
        out_specs=(P("sp", None), P(), P()),
    )
    return jax.jit(shmapped)


def sharded_streaming_spec_db(mesh, wav, win, hop, c, s, mel_fb=None,
                              chunk_frames: int = 4096,
                              scale: float = 2.0**-15):
    """Host wrapper for the mesh long-file pipeline (1-D "sp" usage of the
    mesh; pass a mesh with dp=1).  Mirrors streaming_spec_db's contract:
    returns (db sharded device array, n_frames, min_db, max_db).

    ``scale`` is the integer-carrier unit (io/audio.py
    open_audio_mono_ex); the mesh kernel's int16 lane bakes 2^-15, so any
    other carrier is scaled to f32 host-side (bit-identical).
    """
    import numpy as np

    from ..ops.framing import n_frames_for, reflect_pad_center
    from ..utils import round_up_to

    n_sp = mesh.shape["sp"]
    if wav.dtype == np.int16 and scale == 2.0**-15:
        dtype = np.int16
    elif wav.dtype in (np.int16, np.int32):
        wav = wav.astype(np.float32) * np.float32(scale)
        dtype = np.float32
    else:
        dtype = np.float32
    wav = np.ascontiguousarray(wav, dtype=dtype)
    n_frames = n_frames_for(len(wav), win, hop)
    fpd = round_up_to(-(-max(n_frames, 1) // n_sp), chunk_frames)
    chunks_per_dev = fpd // chunk_frames
    n_total = fpd * n_sp
    halo = win - hop
    padded = reflect_pad_center(wav, win)
    need = n_total * hop + halo
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    body = padded[: n_total * hop]
    tail = padded[n_total * hop : n_total * hop + halo]

    fn = make_sharded_streaming_fn(
        mesh, win=win, hop=hop, chunk_frames=chunk_frames,
        chunks_per_dev=chunks_per_dev, use_mel=mel_fb is not None,
        mode=get_precision_mode(),
    )
    dev_body = jax.device_put(body, NamedSharding(mesh, P("sp")))
    dev_tail = jax.device_put(tail, NamedSharding(mesh, P(None)))
    rep = NamedSharding(mesh, P(None, None))
    c_d = jax.device_put(np.asarray(c), rep)
    s_d = jax.device_put(np.asarray(s), rep)
    fb_d = jax.device_put(
        np.asarray(mel_fb) if mel_fb is not None else np.zeros((1, 1), np.float32),
        rep,
    )
    db, gmin, gmax = fn(dev_body, dev_tail, c_d, s_d, fb_d,
                        jnp.int32(n_frames))
    return db, n_frames, float(gmin), float(gmax)


@functools.lru_cache(maxsize=64)
def make_freq_sharded_fn(mesh, *, win, hop, n_frames, use_mel,
                         mode="parity"):
    """TENSOR-parallel spectrogram: the frequency dimension of the
    windowed-DFT matrices (and the matching mel-filterbank rows) shards
    over the "sp" axis — each device computes a frequency slice of the
    magnitude and a partial mel projection, combined with one psum.  This
    is the row-sharded-FFN pattern applied to the DFT: valid because the
    nonlinearity (|.|) is elementwise per frequency column, so
    mel = sum_freq |X_f| fb_f decomposes across devices.

    Use when n_fft is large enough that the DFT matrices dominate VMEM/HBM
    per chip, or to cut per-chip FLOPs for one very hot stream; for many
    independent tracks, prefer dp batching (sharded_spec_pipeline).

    Returns fn(padded (L,), c_sh, s_sh, fb_sh) -> db (n_frames, n_out)
    replicated.  c_sh/s_sh: (win, F) sharded on dim 1; fb_sh: (F, n_mel)
    sharded on dim 0.
    """
    t_overlap = win // hop

    def per_device(padded, c_l, s_l, fb_l):
        n_rows = n_frames + t_overlap - 1
        x2d = padded[: n_rows * hop].reshape(n_rows, hop)
        frames = jnp.concatenate(
            [jax.lax.slice_in_dim(x2d, t, t + n_frames, axis=0)
             for t in range(t_overlap)],
            axis=1,
        )
        from ..config import precision_for

        prec = precision_for(mode)
        re = jnp.dot(frames, c_l, precision=prec,
                     preferred_element_type=jnp.float32)
        im = jnp.dot(frames, s_l, precision=prec,
                     preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im)  # local frequency slice
        if use_mel:
            part = jnp.dot(mag, fb_l, precision=prec,
                           preferred_element_type=jnp.float32)
            return amp_to_db(jax.lax.psum(part, "sp"))  # TP combine
        # linear scale: dB is per-frequency elementwise, so the output just
        # stays frequency-sharded (no collective needed at all)
        return amp_to_db(mag)

    shmapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None), P(None, "sp"), P(None, "sp"), P("sp", None)),
        out_specs=P(None, None) if use_mel else P(None, "sp"),
    )
    return jax.jit(shmapped)


def freq_sharded_spec(mesh, wav, win, hop, c, s, mel_fb=None):
    """Host wrapper for the tensor-parallel pipeline (pads the frequency
    dim to a multiple of the mesh's sp size; zero columns contribute
    nothing).  Returns (db (n_frames, n_out) replicated, n_frames)."""
    import numpy as np

    from ..ops.framing import n_frames_for, reflect_pad_center

    n_sp = mesh.shape["sp"]
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    n_frames = n_frames_for(len(wav), win, hop)
    padded = reflect_pad_center(wav, win)
    need = (n_frames - 1) * hop + win
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    padded = padded[:need]

    c = np.asarray(c)
    s = np.asarray(s)
    n_freq = c.shape[1]
    f_pad = (-n_freq) % n_sp
    c_p = np.pad(c, ((0, 0), (0, f_pad)))
    s_p = np.pad(s, ((0, 0), (0, f_pad)))
    use_mel = mel_fb is not None
    if use_mel:
        fb_p = np.pad(np.asarray(mel_fb), ((0, f_pad), (0, 0)))
    else:
        fb_p = np.zeros((n_freq + f_pad, 1), np.float32)

    fn = make_freq_sharded_fn(
        mesh, win=win, hop=hop, n_frames=n_frames, use_mel=use_mel,
        mode=get_precision_mode(),
    )
    rep = NamedSharding(mesh, P(None))
    db = fn(
        jax.device_put(padded, rep),
        jax.device_put(c_p, NamedSharding(mesh, P(None, "sp"))),
        jax.device_put(s_p, NamedSharding(mesh, P(None, "sp"))),
        jax.device_put(fb_p, NamedSharding(mesh, P("sp", None))),
    )
    if not use_mel and f_pad:
        db = db[:, :n_freq]
    return db, n_frames


# ---------------------------------------------------------------------------
# Sequence-sharded waveform envelope (display.rs:92-97 min/max windows).
#
# The envelope render scans the whole waveform once per zoom — at hour
# scale that is the second-largest device pass after the STFT itself.  The
# sharded form splits the waveform across every mesh device (both axes
# flattened: a pure sequence op has no batch dimension), exchanges a
# 1.5*spp-sample halo with each neighbor over ICI (two ppermutes), and each
# device reduces the columns whose windows live in its local span.  Column
# windows come in pre-clamped from the host (the exact f32 rust-round
# semantics of render/envelope.py col_windows), so the device math is pure
# min/max — parity with the single-chip path is bit-for-bit.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def make_sharded_envelope_fn(mesh, *, cols_per_dev, local_len, halo, max_w):
    """Build the jitted shard_map envelope reducer for one shape bucket.

    fn(wav (n_dev*local_len,) sharded, starts (n_dev*cols_per_dev,) i32,
       ends (same,)) -> (mx, mn) each (n_dev*cols_per_dev,) f32 sharded.
    ``starts``/``ends`` are GLOBAL sample indices, already clamped to the
    real signal; windows are guaranteed <= max_w and to reach at most
    ``halo`` samples outside the local span.
    """
    from jax.experimental.shard_map import shard_map

    axes = ("dp", "sp")
    n_dev = mesh.shape["dp"] * mesh.shape["sp"]

    def per_device(wav_l, starts_l, ends_l):
        d = jax.lax.axis_index("dp") * mesh.shape["sp"] + jax.lax.axis_index("sp")
        # halo exchange: left neighbor's tail, right neighbor's head.
        # Missing ends (device 0 / n-1) receive zeros — harmless, since
        # starts/ends never index outside the real signal.
        right_src = [(i, i + 1) for i in range(n_dev - 1)]
        left_src = [(i + 1, i) for i in range(n_dev - 1)]
        lh = jax.lax.ppermute(wav_l[-halo:], axes, right_src)
        rh = jax.lax.ppermute(wav_l[:halo], axes, left_src)
        ext = jnp.concatenate([lh, wav_l, rh])
        base = d * local_len - halo  # global index of ext[0]
        offs = jnp.arange(max_w, dtype=jnp.int32)[None, :]
        idx_g = starts_l[:, None] + offs
        valid = idx_g < ends_l[:, None]
        idx_l = jnp.clip(idx_g - base, 0, ext.shape[0] - 1)
        g = ext[idx_l]
        mx = jnp.max(jnp.where(valid, g, -jnp.inf), axis=1)
        mn = jnp.min(jnp.where(valid, g, jnp.inf), axis=1)
        return mx, mn

    spec_w = P(("dp", "sp"))
    return jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(spec_w, spec_w, spec_w),
            out_specs=(spec_w, spec_w),
        )
    )


def sharded_envelope_minmax(mesh, wav, n_cols: int):
    """Per-column (max, min) of the min/max waveform envelope, sequence-
    sharded over every device of ``mesh``.

    Columns follow the reference semantics (display.rs:92-97 via
    render/envelope.py col_windows): window i spans
    [round((i-1.5)*spp), round((i+1.5)*spp)) clamped to the signal, spp =
    len(wav)/n_cols.  Requires spp >= 1 (the upsampling branch is a
    host-side pre-step on the single-chip path).  Returns (mx, mn) numpy
    arrays of length n_cols, bit-identical to the unsharded reduction.

    Per-device columns reduce via a clamped gather — fine for the
    many-devices/modest-columns shapes this targets; a per-shard
    sparse-table build (render/envelope.py) is the next step if a
    single-shard column count ever grows gather-bound (CLAUDE.md: TPU
    gathers run 10-30x slower per element than streaming reads).
    """
    import numpy as np

    from ..render.envelope import column_windows

    f32 = np.float32
    n = len(wav)
    if n_cols < 1 or n < n_cols:
        raise ValueError(f"need 1 <= n_cols <= len(wav), got {n_cols}, {n}")
    n_dev = mesh.shape["dp"] * mesh.shape["sp"]
    spp = f32(n) / f32(n_cols)
    # the one shared window-math helper: bit-identical to the single-chip
    # EnvelopeState builds by construction
    i_px = np.arange(n_cols, dtype=np.float32)
    starts, ends = column_windows(i_px, n_cols, n, n)

    cols_per_dev = -(-n_cols // n_dev)
    n_cols_pad = cols_per_dev * n_dev
    # device d's wav shard must cover its columns' windows: col c lives
    # near sample c*spp, so the shard length tracks cols_per_dev*spp (the
    # per-device drift from the ceil is < 1 sample per device boundary,
    # absorbed into the halo below)
    local_len = int(np.ceil(cols_per_dev * float(spp)))
    n_pad = local_len * n_dev
    # dummy columns: 1-sample windows at the end of their device's span so
    # the halo bound still holds; results are discarded host-side
    d_of = np.minimum(np.arange(n_cols, n_cols_pad) // cols_per_dev,
                      n_dev - 1)
    pad_pos = np.minimum((d_of + 1) * local_len - 1, n - 1)
    starts_p = np.concatenate([starts, pad_pos]).astype(np.int32)
    ends_p = np.concatenate([ends, pad_pos + 1]).astype(np.int32)
    max_w = int((ends - starts).max())
    # Exact halo from the actual window arrays: an analytic bound
    # (1.5*spp + drift) misses the f32 product rounding in starts/ends,
    # which grows as position * 2^-24 — ~5-10 samples at hour-scale n,
    # where a too-small halo silently clips the gather to a wrong sample
    # (caught by review: column windows fell 3 samples outside coverage
    # at n ~ 1.5e8).  Computing the per-device reach from starts/ends
    # themselves is coverage by construction.
    col_dev = np.arange(n_cols_pad, dtype=np.int64) // cols_per_dev
    left_reach = (col_dev * local_len
                  - starts_p.astype(np.int64)).max()
    right_reach = (ends_p.astype(np.int64)
                   - (col_dev + 1) * local_len).max()
    halo_exact = int(max(left_reach, right_reach, 1)) + 1
    if halo_exact > local_len:
        raise ValueError(
            f"shards too small for the halo ({local_len} < {halo_exact}): "
            f"use fewer devices or more samples per column")
    # bucket up (program-cache reuse across zoom levels) but never past
    # local_len — coverage only needs the exact value
    halo = min(1 << max(int(np.ceil(np.log2(halo_exact))), 1), local_len)
    # bucket the gather width so zoom levels share compiled programs
    max_w_b = 1 << max(int(np.ceil(np.log2(max(max_w, 2)))), 1)

    wav_f = np.zeros(n_pad, np.float32)
    wav_f[:n] = np.asarray(wav, np.float32)

    fn = make_sharded_envelope_fn(
        mesh, cols_per_dev=cols_per_dev, local_len=local_len, halo=halo,
        max_w=max_w_b,
    )
    sh = NamedSharding(mesh, P(("dp", "sp")))
    mx, mn = fn(
        jax.device_put(wav_f, sh),
        jax.device_put(starts_p, sh),
        jax.device_put(ends_p, sh),
    )
    import numpy as _np

    return _np.asarray(mx)[:n_cols], _np.asarray(mn)[:n_cols]
