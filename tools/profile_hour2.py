"""Honest hour-workload profiling: every measurement ends in a VALUE FETCH.

On the axon relay, block_until_ready() returns once the command is
enqueued, not executed (profile_hour.py v1 measured 1.3 ms for the full
hour compute).  The only trustworthy sync is a device->host readback, so
each stage here fetches a scalar that data-depends on the work.  Run ONE
experiment per process (prior experiments otherwise leave backlog in the
stream): python tools/profile_hour2.py {transfer,compute,e2e,interleave}
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["transfer", "compute", "e2e", "interleave"])
    ap.add_argument("--seconds", type=float, default=3600.0)
    ap.add_argument("--reps", type=int, default=2)
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

    def fetch(x):
        """Honest sync: readback of one element that depends on x."""
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)
    win, hop = p.win_length, p.hop_length
    cf, sc = args.chunk_frames, args.seg_chunks

    n = int(48000 * args.seconds)
    tt = np.arange(n, dtype=np.float64) / 48000.0
    mono = np.clip((0.3 * np.sin(2 * np.pi * 220.0 * tt) +
                    0.1 * np.sin(2 * np.pi * 1337.0 * tt)) * 32768.0,
                   -32768, 32767).astype(np.int16)
    del tt

    n_frames = n_frames_for(n, win, hop)
    seg_frames = cf * sc
    n_segs = -(-n_frames // seg_frames)
    padded = reflect_pad_center(mono, win)
    need = n_segs * seg_frames * hop + (win - hop)
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    seg_len = seg_frames * hop + (win - hop)
    segs_np = [np.ascontiguousarray(padded[i * seg_frames * hop:
                                           i * seg_frames * hop + seg_len])
               for i in range(n_segs)]
    tot_mb = sum(x.nbytes for x in segs_np) / 1e6
    emit(exp=args.exp, n_segs=n_segs, tot_mb=round(tot_mb, 1))

    c_d, s_d = jnp.asarray(c), jnp.asarray(s)
    w_d = jnp.asarray(np.zeros(win, np.float32))
    fb_d = jnp.asarray(fb)
    fetch(c_d), fetch(s_d), fetch(fb_d)  # warm + drain

    def core(ds, i):
        nv = max(0, min(n_frames - i * seg_frames, seg_frames))
        return _streaming_core(
            ds, c_d, s_d, w_d, fb_d, jnp.int32(nv), jnp.float32(2.0**-15),
            win=win, hop=hop, n_fft=win, chunk_frames=cf, n_chunks=sc,
            use_mel=True, impl="dft", mode="parity")

    if args.exp == "transfer":
        for r in range(args.reps):
            t0 = time.perf_counter()
            devs = [jax.device_put(x) for x in segs_np]
            for d in devs:
                fetch(d)
            dt = time.perf_counter() - t0
            emit(name="transfer_all", rep=r, secs=round(dt, 3),
                 mbps=round(tot_mb / dt, 1))
            del devs

    elif args.exp == "compute":
        # warm compile with segment 0, then ensure residency of all
        o = core(jax.device_put(segs_np[0]), 0)
        fetch(o[0])
        devs = [jax.device_put(x) for x in segs_np]
        for d in devs:
            fetch(d)
        for r in range(args.reps):
            t0 = time.perf_counter()
            outs = [core(d, i) for i, d in enumerate(devs)]
            for o in outs:
                fetch(o[0])
            dt = time.perf_counter() - t0
            emit(name="compute_all", rep=r, secs=round(dt, 3),
                 frames_per_s=round(n_frames / dt))

    elif args.exp == "e2e":
        def run():
            db, nfr, lo, hi = streaming_spec_db(
                mono, win, hop, c, s, fb, chunk_frames=cf, seg_chunks=sc)
            return fetch(db)
        t0 = time.perf_counter()
        run()  # warm incl. compile
        emit(name="e2e_warmup", secs=round(time.perf_counter() - t0, 3))
        for r in range(args.reps):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            emit(name="e2e", rep=r, secs=round(dt, 3),
                 realtime=round(args.seconds / dt, 1))

    elif args.exp == "interleave":
        # software-pipelined: put(k+1) enqueued right after compute(k)
        o = core(jax.device_put(segs_np[0]), 0)
        fetch(o[0])  # warm compile
        for r in range(args.reps):
            t0 = time.perf_counter()
            outs = []
            d = jax.device_put(segs_np[0])
            for i in range(n_segs):
                o = core(d, i)
                outs.append(o)
                if i + 1 < n_segs:
                    d = jax.device_put(segs_np[i + 1])
            for o in outs:
                fetch(o[0])
            dt = time.perf_counter() - t0
            emit(name="interleave", rep=r, secs=round(dt, 3),
                 realtime=round(args.seconds / dt, 1))


if __name__ == "__main__":
    main()
