"""Isolate the wirepack device cost: alternate raw/pack e2e reps (controls
for tunnel drift) and time transfer-only and unpack-only stages.
Run: python tools/profile_unpack_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db
    from msv_tpu.parallel.wirepack import pack_i16, unpack_jax
    from msv_tpu.utils.jaxcache import enable_compilation_cache
    from tools.profile_pack_tpu import realistic_audio

    enable_compilation_cache()

    def fetch(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    seconds = 1800.0
    mono = realistic_audio(seconds)
    seg = mono[: 16543744]  # one full segment's worth (~33 MB)
    p = pack_i16(seg)
    print(json.dumps({"name": "seg", "mb": round(seg.nbytes / 1e6, 1),
                      "packed_mb": round(p.nbytes / 1e6, 1)}), flush=True)

    # warm compiles
    fetch(unpack_jax(p))
    d = jax.device_put(seg)
    fetch(d)

    for r in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(seg)
        fetch(d)
        t_raw = time.perf_counter() - t0

        t0 = time.perf_counter()
        u = unpack_jax(p)
        fetch(u)
        t_pack = time.perf_counter() - t0

        # unpack with operands already resident: device compute only
        pw = jnp.asarray(p.words)
        bw = jnp.asarray(p.block_w)
        bs = jnp.asarray(p.block_start)
        hd_np = np.zeros(2, np.int32); hd_np[: p.order] = p.head
        hd = jnp.asarray(hd_np)
        fetch(pw), fetch(bw), fetch(bs), fetch(hd)
        from msv_tpu.parallel.wirepack import unpack_device

        t0 = time.perf_counter()
        u2 = unpack_device(pw, bw, bs, hd, p.order, jnp.int32(p.shift),
                           n=p.n, n_blocks=len(p.block_w))
        fetch(u2)
        t_unpack = time.perf_counter() - t0
        print(json.dumps({
            "rep": r,
            "raw_transfer_s": round(t_raw, 3),
            "pack_transfer_unpack_s": round(t_pack, 3),
            "unpack_only_s": round(t_unpack, 3),
        }), flush=True)

    # alternating full-pipeline A/B on the 30-minute file
    pp = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(pp.win_length, pp.n_fft)
    c, s = windowed_dft_matrices(window, pp.n_fft)
    fb = calc_mel_fb_default(48000, pp.n_fft)

    def run(transfer):
        db, *_ = streaming_spec_db(mono, pp.win_length, pp.hop_length, c, s,
                                   fb, chunk_frames=4096, transfer=transfer)
        return fetch(db)

    run("raw"), run("pack")  # warm
    for r in range(3):
        for transfer in ("raw", "pack"):
            t0 = time.perf_counter()
            run(transfer)
            dt = time.perf_counter() - t0
            print(json.dumps({"name": f"e2e_{transfer}", "rep": r,
                              "secs": round(dt, 2),
                              "realtime": round(seconds / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
