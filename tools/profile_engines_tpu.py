"""Honest per-engine compute comparison at hour scale (VERDICT r1 #4).

All operands device-resident; timing ends in a value fetch.  Compares the
three streaming engines (XLA DFT-GEMM, XLA native rfft, fused Pallas) on
identical segments, in both precision modes for pallas.
Run: python tools/profile_engines_tpu.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bench import realistic_audio
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import _streaming_core
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    def fetch(x):
        return float(np.asarray(jax.device_get(x.ravel()[0])))

    seconds = 1800.0
    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)
    win, hop = p.win_length, p.hop_length
    cf, sc = 4096, 8

    mono = realistic_audio(seconds)
    n_frames = n_frames_for(len(mono), win, hop)

    # ---- FLOPs / MFU model (VERDICT r2 #8) -------------------------------
    # Useful work per frame: two (win x n_freq) windowed-DFT GEMVs, the
    # magnitude, and the (n_freq x n_mel) mel GEMV.  Padding flops are NOT
    # counted (standard MFU).  Peak assumed 197 TFLOP/s bf16 on one v5e
    # chip; parity mode runs multi-pass f32 on the same MXU, so its MFU is
    # reported against the same bf16 peak (honest "fraction of the chip").
    n_freq = p.n_fft // 2 + 1
    n_mel = fb.shape[1]
    flops_frame = 4 * win * n_freq + 2 * n_freq * n_mel + 4 * n_freq
    peak_bf16 = 197e12

    def mfu_fields(med):
        fps = n_frames / med
        tf = fps * flops_frame
        return {
            "frames_per_s": round(fps),
            "tflops": round(tf / 1e12, 2),
            "mfu_vs_bf16_peak_pct": round(100.0 * tf / peak_bf16, 2),
        }
    seg_frames = cf * sc
    n_segs = -(-n_frames // seg_frames)
    padded = reflect_pad_center(mono, win)
    need = n_segs * seg_frames * hop + (win - hop)
    if len(padded) < need:
        padded = np.pad(padded, (0, need - len(padded)))
    seg_len = seg_frames * hop + (win - hop)
    segs = [jax.device_put(np.ascontiguousarray(
        padded[i * seg_frames * hop : i * seg_frames * hop + seg_len]))
        for i in range(n_segs)]
    for d in segs:
        fetch(d)
    c_d, s_d = jnp.asarray(c), jnp.asarray(s)
    w_d = jnp.asarray(np.asarray(window, np.float32))
    fb_d = jnp.asarray(fb)
    print(json.dumps({"name": "setup", "n_segs": n_segs,
                      "n_frames": n_frames}), flush=True)

    def run_core(impl, mode):
        outs = []
        for i, d in enumerate(segs):
            nv = max(0, min(n_frames - i * seg_frames, seg_frames))
            outs.append(_streaming_core(
                d, c_d, s_d, w_d, fb_d, jnp.int32(nv), jnp.float32(2.0**-15),
                win=win, hop=hop, n_fft=p.n_fft, chunk_frames=cf,
                n_chunks=sc, use_mel=True, impl=impl, mode=mode))
        for o in outs:
            fetch(o[0])

    for impl, mode in [("dft", "parity"), ("dft", "fast"),
                       ("fft", "parity")]:
        t0 = time.perf_counter()
        run_core(impl, mode)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_core(impl, mode)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        print(json.dumps({"name": f"{impl}_{mode}", "warm_s": round(warm, 2),
                          "median_s": round(med, 3),
                          "all": [round(t, 3) for t in times],
                          **mfu_fields(med)}), flush=True)

    # pallas engine (fused kernel over frame tiles)
    from msv_tpu.kernels.spectrogram_pallas import (
        mel_spectrogram_pallas, prepare_matrices, prepare_wav2d,
    )

    # tile_f sweep: the C/S/fb tiles re-stream from HBM per frame tile, so
    # doubling tile_f halves the dominant DMA traffic (VMEM-bounded)
    for mode, tile_f in (("parity", 128), ("fast", 128), ("fast", 256),
                         ("fast", 512), ("parity", 256)):
        c3, s3, fb3, n_mel_k = prepare_matrices(np.asarray(c), np.asarray(s),
                                                np.asarray(fb), win)
        if mode == "fast":
            import ml_dtypes

            c3 = c3.astype(ml_dtypes.bfloat16)
            s3 = s3.astype(ml_dtypes.bfloat16)
            fb3 = fb3.astype(ml_dtypes.bfloat16)
        c3_d, s3_d, fb3_d = jnp.asarray(c3), jnp.asarray(s3), jnp.asarray(fb3)
        wav2ds = [jax.device_put(prepare_wav2d(
            padded[i * seg_frames * hop : i * seg_frames * hop + seg_len],
            win, hop, seg_frames)) for i in range(n_segs)]
        if seg_frames % tile_f:
            continue
        for d in wav2ds:
            fetch(d)

        def run_pallas():
            outs = []
            for d in wav2ds:
                outs.append(mel_spectrogram_pallas(
                    d, c3_d, s3_d, fb3_d, win=win, hop=hop,
                    n_frames=seg_frames, interpret=False, mode=mode,
                    tile_f=tile_f))
            for o in outs:
                fetch(o)

        t0 = time.perf_counter()
        try:
            run_pallas()
        except Exception as e:  # e.g. scoped-vmem OOM for f32 at tile_f>128
            print(json.dumps({"name": f"pallas_{mode}_tf{tile_f}",
                              "error": str(e)[:200]}), flush=True)
            continue
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_pallas()
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        # DMA roof: matrix bytes per frame tile / tile_f frames, at the
        # ~819 GB/s v5e HBM bandwidth
        bpe = 2 if mode == "fast" else 4
        nk = c3.shape[0]
        mat_bytes = nk * (2 * c3.shape[1] * 256 + 256 * fb3.shape[2]) * bpe
        dma_roof_fps = 819e9 / (mat_bytes / tile_f)
        print(json.dumps({"name": f"pallas_{mode}_tf{tile_f}",
                          "warm_s": round(warm, 2),
                          "median_s": round(med, 3),
                          "all": [round(t, 3) for t in times],
                          **mfu_fields(med),
                          "dma_roof_frames_per_s": round(dma_roof_fps),
                          }), flush=True)


if __name__ == "__main__":
    main()
