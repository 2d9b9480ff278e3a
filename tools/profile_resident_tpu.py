"""VMEM-resident vs streaming Pallas kernel on real TPU (VERDICT r3 #2).

The round-3 kernel re-streams C/S/fb from HBM once per frame tile; for
buckets whose operand set fits VMEM that traffic is pure waste.  This
profiles both schedules per bucket/mode/tile_f, device-resident operands,
timing ending in a value fetch, and prints one JSON line per config.

Also force-attempts the resident 48 kHz bucket (whose ~11 MB bf16
operands only fit if the pipeline emitter single-buffers constant-index
blocks — the plan assumes 2x conservatively): a clean compile there
falsifies the 2x assumption and unlocks residency for every bucket.

Run: python tools/profile_resident_tpu.py [--seconds 600]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=600.0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from bench import realistic_audio
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.kernels.spectrogram_pallas import (
        _resident_plan,
        TILE_K,
        mel_spectrogram_pallas,
        prepare_matrices,
        prepare_wav2d,
    )
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    def fetch(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    peak_bf16 = 197e12
    seg_frames = 32768

    for sr in (16000, 48000):
        p = derive_stft_params(sr, SpecSetting())
        win, hop = p.win_length, p.hop_length
        window = default_stft_window(win, p.n_fft)
        c, s = windowed_dft_matrices(window, p.n_fft)
        fb = calc_mel_fb_default(sr, p.n_fft)
        n_freq = p.n_fft // 2 + 1
        n_mel = fb.shape[1]
        flops_frame = 4 * win * n_freq + 2 * n_freq * n_mel + 4 * n_freq

        mono = realistic_audio(args.seconds, sr=sr)
        n_frames = n_frames_for(len(mono), win, hop)
        n_segs = -(-n_frames // seg_frames)
        padded = reflect_pad_center(mono.astype(np.float32) / 32768.0, win)
        seg_len = seg_frames * hop + (win - hop)
        need = n_segs * seg_frames * hop + (win - hop)
        if len(padded) < need:
            padded = np.pad(padded, (0, need - len(padded)))
        wav2ds = [jax.device_put(prepare_wav2d(
            padded[i * seg_frames * hop : i * seg_frames * hop + seg_len],
            win, hop, seg_frames)) for i in range(n_segs)]
        for d in wav2ds:
            fetch(d)
        total_frames = n_segs * seg_frames
        print(json.dumps({"name": f"setup_{sr}", "n_segs": n_segs,
                          "win": win, "n_mel": n_mel}), flush=True)

        for mode in ("fast", "parity"):
            c3, s3, fb3, _ = prepare_matrices(
                np.asarray(c), np.asarray(s), np.asarray(fb), win)
            bpe = 2 if mode == "fast" else 4
            if mode == "fast":
                c3 = c3.astype(ml_dtypes.bfloat16)
                s3 = s3.astype(ml_dtypes.bfloat16)
                fb3 = fb3.astype(ml_dtypes.bfloat16)
            c3d, s3d, fb3d = (jnp.asarray(c3), jnp.asarray(s3),
                              jnp.asarray(fb3))
            nk, win_p = c3.shape[0], c3.shape[1]
            n_mel_p = fb3.shape[2]
            hop_p = wav2ds[0].shape[1]
            fits, plan_tf = _resident_plan(
                seg_frames, nk, win_p, hop_p, n_mel_p, win // hop, bpe, 4)

            cases = [("stream", 128), ("stream", 512 if mode == "fast"
                                       else 128)]
            if fits:
                cases += [("resident", plan_tf), ("resident", 128)]
            else:
                # force-attempt: tests the 2x double-buffer assumption
                cases += [("resident", 128)]
            seen = set()
            for variant, tf in cases:
                if (variant, tf) in seen or seg_frames % tf:
                    continue
                seen.add((variant, tf))
                name = f"{sr}_{mode}_{variant}_tf{tf}"

                def run():
                    outs = [mel_spectrogram_pallas(
                        d, c3d, s3d, fb3d, win=win, hop=hop,
                        n_frames=seg_frames, mode=mode,
                        tile_f=tf, variant=variant) for d in wav2ds]
                    for o in outs:
                        fetch(o)

                t0 = time.perf_counter()
                try:
                    run()
                except Exception as e:
                    print(json.dumps({"name": name,
                                      "error": str(e)[:300]}), flush=True)
                    continue
                warm = time.perf_counter() - t0
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    run()
                    times.append(time.perf_counter() - t0)
                med = sorted(times)[len(times) // 2]
                fps = total_frames / med
                mat_bytes = nk * (2 * win_p * TILE_K
                                  + TILE_K * n_mel_p) * bpe
                roof = (819e9 / (mat_bytes / tf) if variant == "stream"
                        else 819e9 / (hop_p * 4 + n_mel_p * 4))
                print(json.dumps({
                    "name": name, "warm_s": round(warm, 2),
                    "median_s": round(med, 3),
                    "all": [round(t, 3) for t in times],
                    "frames_per_s": round(fps),
                    "tflops": round(fps * flops_frame / 1e12, 2),
                    "mfu_vs_bf16_peak_pct": round(
                        100.0 * fps * flops_frame / peak_bf16, 2),
                    "dma_roof_frames_per_s": round(roof),
                }), flush=True)


if __name__ == "__main__":
    main()
