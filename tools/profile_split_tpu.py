"""48 kHz kernel A/B: parity (f32 tf128) vs split-f32 vs fast (VERDICT #9).

Device-resident, value-fetch synced, 30-minute workload — the
profile_engines_tpu.py methodology on the three precision schedules of
the fused Pallas kernel.  Run (needs the tunnel):
    python tools/profile_split_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from bench import realistic_audio
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.kernels.spectrogram_pallas import (
        mel_spectrogram_pallas, prepare_matrices, prepare_matrices_split,
        prepare_wav2d)
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    def fetch(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    seconds = 1800.0
    sr = 48000
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(sr, p.n_fft)
    win, hop = p.win_length, p.hop_length

    mono = realistic_audio(seconds)
    n_frames = n_frames_for(len(mono), win, hop)
    seg_frames = 32768
    n_segs = -(-n_frames // seg_frames)
    padded = reflect_pad_center(mono.astype(np.float32) * 2.0**-15, win)
    need = n_segs * seg_frames * hop + (win - hop)
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    seg_len = seg_frames * hop + (win - hop)

    c3, s3, fb3, n_mel = prepare_matrices(
        np.asarray(c), np.asarray(s), np.asarray(fb), win)
    c4, s4, fb4, _ = prepare_matrices_split(
        np.asarray(c), np.asarray(s), np.asarray(fb), win)
    ops = {
        "parity": tuple(jnp.asarray(a) for a in (c3, s3, fb3)),
        "fast": tuple(jnp.asarray(a.astype(ml_dtypes.bfloat16))
                      for a in (c3, s3, fb3)),
        "split": tuple(jnp.asarray(a) for a in (c4, s4, fb4)),
    }
    wav2ds = [jax.device_put(prepare_wav2d(
        padded[i * seg_frames * hop: i * seg_frames * hop + seg_len],
        win, hop, seg_frames)) for i in range(n_segs)]
    for d in wav2ds:
        fetch(d)
    print(json.dumps({"name": "setup", "n_segs": n_segs,
                      "n_frames": n_frames}), flush=True)

    configs = [("parity", None), ("split", None), ("split", 256),
               ("split", 128), ("fast", None)]
    for mode, tile_f in configs:
        a, b, f = ops[mode]

        def run():
            out = None
            for d in wav2ds:
                out = mel_spectrogram_pallas(
                    d, a, b, f, win=win, hop=hop, n_frames=seg_frames,
                    interpret=False, mode=mode, tile_f=tile_f,
                    variant="stream")
            fetch(out)

        label = f"{mode}_tf{tile_f or 'auto'}"
        t0 = time.perf_counter()
        try:
            run()
        except Exception as e:
            print(json.dumps({"name": label, "error": str(e)[:300]}),
                  flush=True)
            continue
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        print(json.dumps({
            "name": label, "warm_s": round(warm, 2),
            "median_s": round(med, 3),
            "all": [round(t, 3) for t in times],
            "frames_per_s": round(n_segs * seg_frames / med),
        }), flush=True)


if __name__ == "__main__":
    main()
