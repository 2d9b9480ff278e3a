"""Measure the production streaming path on the real TPU: raw vs wirepack.

Honest timing: ends in a value fetch.  Signal is realistic (harmonic stack
+ noise floor), not a pure sine, so the compression ratio is representative.
Run: python tools/profile_pack_tpu.py [--seconds 3600]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


from bench import realistic_audio  # single definition, shared with bench.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3600.0)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax

    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db
    from msv_tpu.parallel.wirepack import pack_i16
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)

    t0 = time.perf_counter()
    mono = realistic_audio(args.seconds)
    print(json.dumps({"name": "gen", "secs": round(time.perf_counter() - t0, 2),
                      "mb": round(mono.nbytes / 1e6, 1)}), flush=True)
    t0 = time.perf_counter()
    pk = pack_i16(mono[: 48000 * 60])
    ratio = pk.nbytes / (48000 * 60 * 2) if pk else 1.0
    print(json.dumps({"name": "pack_ratio_1min",
                      "secs": round(time.perf_counter() - t0, 3),
                      "ratio": round(ratio, 3)}), flush=True)

    def fetch(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    for transfer in ("raw", "pack"):
        def run():
            db, nfr, lo, hi = streaming_spec_db(
                mono, p.win_length, p.hop_length, c, s, fb,
                chunk_frames=4096, transfer=transfer)
            return fetch(db)
        t0 = time.perf_counter()
        run()
        print(json.dumps({"name": f"warm_{transfer}",
                          "secs": round(time.perf_counter() - t0, 2)}),
              flush=True)
        for r in range(args.reps):
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
            print(json.dumps({"name": f"e2e_{transfer}", "rep": r,
                              "secs": round(dt, 2),
                              "realtime": round(args.seconds / dt, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
