"""Same-window hour A/B: v2 wire codec vs v1 (round-5 VERDICT #4).

Interleaves full hour-scale streaming runs with transfer='auto' (v2:
per-block LPC / patched widths via native/wirepack2.cc) and 'pack1' (the
round-2 delta codec) so both sample the same tunnel weather, and reports
per-codec wall medians plus the exact packed byte counts (weather-free).

Run (needs the tunnel): python tools/profile_wire_ab.py [--seconds 3600]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3600.0)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    from bench import realistic_audio
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db
    from msv_tpu.parallel.wirepack import pack_best, pack_int
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)
    mono = realistic_audio(args.seconds)

    # weather-free fact: bytes per codec on one representative segment
    seg = mono[: 15729600 if len(mono) >= 15729600 else len(mono)]
    b1 = pack_int(seg)
    b2 = pack_best(seg)
    print(json.dumps({
        "name": "segment_bytes",
        "raw": seg.nbytes,
        "v1": b1.nbytes if b1 is not None else seg.nbytes,
        "v2": b2.nbytes if b2 is not None else seg.nbytes,
    }), flush=True)

    def run(transfer):
        db, nfr, lo, hi = streaming_spec_db(
            mono, p.win_length, p.hop_length, c, s, fb,
            chunk_frames=4096, transfer=transfer)
        float(np.asarray(jax.device_get(db.ravel()[0])))
        return nfr

    for transfer in ("auto", "pack1"):  # warm both compile families
        run(transfer)
    walls = {"auto": [], "pack1": []}
    for rep in range(args.reps):
        for transfer in ("auto", "pack1"):
            t0 = time.perf_counter()
            run(transfer)
            dt = time.perf_counter() - t0
            walls[transfer].append(dt)
            print(json.dumps({"name": "rep", "rep": rep,
                              "transfer": transfer,
                              "wall_s": round(dt, 2)}), flush=True)
    med = {k: sorted(v)[len(v) // 2] for k, v in walls.items()}
    print(json.dumps({
        "name": "summary",
        "v2_wall_median_s": round(med["auto"], 2),
        "v1_wall_median_s": round(med["pack1"], 2),
        "v2_realtime": round(args.seconds / med["auto"], 1),
        "v1_realtime": round(args.seconds / med["pack1"], 1),
        "all": {k: [round(t, 2) for t in v] for k, v in walls.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
