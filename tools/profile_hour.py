"""Breakdown profiling of the hour-scale streaming workload on the real TPU.

Measures, with reps, where the wall time goes:
  rpc_floor        warm trivial-jit dispatch latency (tunnel RPC floor)
  put_1k / put_seg / put_all   host->device transfer throughput
  compute_only     scans over device-resident segments (no transfer)
  e2e              full streaming_spec_db (current production path)

Prints one JSON line per measurement.  Run on the axon TPU:
  python tools/profile_hour.py [--seconds 3600] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t():
    return time.perf_counter()


def emit(name, secs, **kw):
    print(json.dumps({"name": name, "secs": round(secs, 4), **kw}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3600.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk-frames", type=int, default=4096)
    ap.add_argument("--seg-chunks", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import _streaming_core, streaming_spec_db
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    emit("backend", 0.0, platform=jax.default_backend(),
         devices=len(jax.devices()))

    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)

    n = int(48000 * args.seconds)
    tt = np.arange(n, dtype=np.float64) / 48000.0
    mono_f = (0.3 * np.sin(2 * np.pi * 220.0 * tt) +
              0.1 * np.sin(2 * np.pi * 1337.0 * tt))
    del tt
    mono = np.clip(mono_f * 32768.0, -32768, 32767).astype(np.int16)
    del mono_f
    emit("audio", 0.0, samples=n, mb=round(mono.nbytes / 1e6, 1))

    win, hop = p.win_length, p.hop_length
    cf, sc = args.chunk_frames, args.seg_chunks
    n_frames = n_frames_for(n, win, hop)
    seg_frames = cf * sc
    n_segs = -(-n_frames // seg_frames)
    padded = reflect_pad_center(mono, win)
    need = n_segs * seg_frames * hop + (win - hop)
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    seg_len = seg_frames * hop + (win - hop)
    emit("plan", 0.0, n_frames=n_frames, n_segs=n_segs,
         seg_mb=round(seg_len * 2 / 1e6, 1))

    # ---- RPC floor: warm trivial jit ----
    f = jax.jit(lambda x: x + 1.0)
    xsmall = jnp.zeros((8, 128), jnp.float32)
    f(xsmall).block_until_ready()
    for r in range(args.reps):
        t0 = t()
        f(xsmall).block_until_ready()
        emit("rpc_floor", t() - t0, rep=r)

    # ---- tiny transfer floor ----
    onek = np.zeros(512, np.int16)
    for r in range(args.reps):
        t0 = t()
        jax.device_put(onek).block_until_ready()
        emit("put_1k", t() - t0, rep=r)

    # ---- one-segment transfer ----
    seg0 = np.ascontiguousarray(padded[:seg_len])
    for r in range(args.reps):
        t0 = t()
        jax.device_put(seg0).block_until_ready()
        d = t() - t0
        emit("put_seg", d, rep=r, mbps=round(seg0.nbytes / 1e6 / d, 1))

    # ---- all segments, enqueued then blocked (current schedule's shape) ----
    segs_np = [np.ascontiguousarray(padded[i * seg_frames * hop:
                                           i * seg_frames * hop + seg_len])
               for i in range(n_segs)]
    for r in range(args.reps):
        t0 = t()
        devs = [jax.device_put(x) for x in segs_np]
        for d_ in devs:
            d_.block_until_ready()
        d = t() - t0
        tot = sum(x.nbytes for x in segs_np)
        emit("put_all", d, rep=r, mbps=round(tot / 1e6 / d, 1))
        del devs

    # ---- compute only: device-resident segments ----
    c_d, s_d = jnp.asarray(c), jnp.asarray(s)
    w_d = jnp.asarray(np.zeros(win, np.float32))
    fb_d = jnp.asarray(fb)
    dev_segs = [jax.device_put(x) for x in segs_np]
    for d_ in dev_segs:
        d_.block_until_ready()

    def compute_all():
        outs = []
        for i, ds in enumerate(dev_segs):
            nv = max(0, min(n_frames - i * seg_frames, seg_frames))
            outs.append(_streaming_core(
                ds, c_d, s_d, w_d, fb_d, jnp.int32(nv), jnp.float32(2.0**-15),
                win=win, hop=hop, n_fft=win, chunk_frames=cf, n_chunks=sc,
                use_mel=True, impl="dft", mode="parity"))
        for o in outs:
            o[0].block_until_ready()
        return outs

    compute_all()  # warm
    for r in range(args.reps):
        t0 = t()
        compute_all()
        emit("compute_only", t() - t0, rep=r,
             frames_per_s=round(n_frames / (t() - t0)))

    del dev_segs

    # ---- e2e current path ----
    def e2e():
        db, nfr, lo, hi = streaming_spec_db(
            mono, win, hop, c, s, fb, chunk_frames=cf, seg_chunks=sc)
        db.block_until_ready()
        float(db[0, 0])
        return nfr

    e2e()  # warm
    for r in range(args.reps):
        t0 = t()
        e2e()
        d = t() - t0
        emit("e2e", d, rep=r, realtime=round(args.seconds / d, 1))


if __name__ == "__main__":
    main()
