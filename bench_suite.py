"""Full benchmark suite: the reference's four criterion workloads
(benches/bench.rs — stale/uncompilable at v0; reproduced here per
BASELINE.md protocol) plus the five BASELINE.json configs.

Prints one JSON object per workload (one line each).  ``bench.py`` remains
the driver's single-line entry point; this suite is the detailed view.

Usage:  python bench_suite.py [--quick] [--skip-hour]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def _wav(path, seconds, sr, stereo=False):
    from msv_tpu.io.audio import write_wav

    rng = np.random.default_rng(7)
    t = np.arange(int(sr * seconds)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * (220 + 110 * np.sin(2 * np.pi * 0.3 * t)) * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)
    data = np.stack([x, 0.8 * x]) if stereo else x[None]
    write_wav(path, data, sr)


def _timeit(fn, reps=3):
    """Median of reps (round-2 methodology: tunnel bandwidth varies ~2x
    run to run, min() overstates).  Every workload's fn ends in a host
    fetch (np image / float scalar), so timings are honest on the axon
    relay, where block_until_ready acks at enqueue."""
    fn()  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def emit(name, seconds, **extra):
    print(json.dumps({"workload": name, "wall_s": round(seconds, 4), **extra}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-hour", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()


    from msv_tpu import MultiTrack
    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.stft import stft_magnitude
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db

    td = tempfile.mkdtemp()

    # ---- reference bench 1: "get mel spectrogram" (bench.rs:62-77) -------
    # 1 s @ 48 kHz, win 1920 / hop 480 / n_fft 2048, mel GEMM + amp->dB.
    p48_1s = os.path.join(td, "w48_1s.wav")
    _wav(p48_1s, 1.0, 48000)
    mt = MultiTrack()

    def run_mel():
        m = MultiTrack()
        m.add_tracks([0], [p48_1s])

    emit("get_mel_spectrogram_1s_48k", _timeit(run_mel),
         reference="bench.rs:62-77", reps=3)

    # ---- reference bench 2: "draw spectrogram" (bench.rs:79-95) ----------
    # cached grey -> Lanczos3 resize -> colormap at 100 px/s x 500 px.
    sec = 10.0
    p48_10s = os.path.join(td, "w48_10s.wav")
    _wav(p48_10s, sec, 48000)
    mt = MultiTrack()
    mt.add_tracks([0], [p48_10s])

    def run_draw():
        img = mt.get_spec_image(0, 100.0, 500)

    emit("draw_spectrogram_100pxs_500px", _timeit(run_draw),
         reference="bench.rs:79-95", audio_seconds=sec, reps=3)

    # ---- reference bench 3: "add track" x6 (bench.rs:32-45) --------------
    def run_add6():
        m = MultiTrack()
        m.add_tracks(list(range(6)), [p48_1s] * 6)

    emit("add_track_x6", _timeit(run_add6), reference="bench.rs:32-45",
         reps=3)

    # ---- reference bench 4: "multitrack get spec image" (bench.rs:47-60) -
    def run_get():
        mt.get_spec_image(0, 100.0, 500)

    emit("multitrack_get_spec_image", _timeit(run_get),
         reference="bench.rs:47-60", reps=3)

    # ---- BASELINE.json configs ------------------------------------------
    # (1) single-file Hann STFT -> dB -> colormap at fixed params
    sr = 16000
    p16 = os.path.join(td, "w16.wav")
    _wav(p16, 5.0 if args.quick else 20.0, sr)
    from msv_tpu.io.audio import open_audio_file

    wav16, _ = open_audio_file(p16)
    wav16 = wav16.sum(axis=0)

    def run_cfg1():
        mag, n = stft_magnitude(wav16, 2048, 512, 2048)
        float(np.asarray(mag.ravel()[0]))  # value fetch = honest sync

    emit("cfg1_stft_16k_nfft2048_hop512", _timeit(run_cfg1),
         reference="BASELINE.json configs[0]", reps=3)

    # (2) all sample rates batched
    paths = []
    for i, sr_i in enumerate([8000, 16000, 22050, 24000, 44100, 48000]):
        pp = os.path.join(td, f"r{sr_i}.wav")
        _wav(pp, 2.0, sr_i)
        paths.append(pp)

    def run_cfg2():
        m = MultiTrack()
        m.add_tracks(list(range(len(paths))), paths)

    emit("cfg2_all_rates_batched", _timeit(run_cfg2),
         reference="BASELINE.json configs[1]", reps=3)

    # (3) 128-band mel path on 48k
    from msv_tpu.ops.mel import calc_mel_fb

    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb128 = calc_mel_fb(48000, p.n_fft, 128)
    wav48, _ = open_audio_file(p48_10s)
    wav48 = wav48.sum(axis=0)

    def run_cfg3():
        db, n, lo, hi = streaming_spec_db(
            wav48, p.win_length, p.hop_length, c, s, fb128, chunk_frames=1024
        )
        float(np.asarray(db.ravel()[0]))  # value fetch = honest sync

    emit("cfg3_mel128_48k", _timeit(run_cfg3),
         reference="BASELINE.json configs[2]", audio_seconds=sec, reps=3)

    # (4) multi-track zoom/crop re-render via kernel relaunch
    def run_cfg4():
        for pps in (80.0, 100.0, 125.0):
            mt.get_spec_image(0, pps, 500)

    emit("cfg4_zoom_rerender_x3", _timeit(run_cfg4),
         reference="BASELINE.json configs[3]", reps=3)

    # (4b) ML frontend: batched log-mel features, fused-kernel default vs
    # the XLA oracle path (VERDICT r2 #7: the one compute-bound,
    # fast-tolerant surface where pallas-fast should win by default)
    from msv_tpu.config import set_engine
    from msv_tpu.features import log_mel_spectrogram

    feat_wav = np.ascontiguousarray(
        (wav48[: 48000 * 4] if len(wav48) >= 48000 * 4 else wav48)
    )
    feat_batch = np.stack([feat_wav] * 4)

    def run_features_default():  # pallas on TPU, XLA elsewhere
        out = log_mel_spectrogram(feat_batch, 48000, n_mel=128,
                                  win_ms=40.0, hop_ms=10.0)
        float(np.asarray(out.ravel()[0]))

    def run_features_xla():
        set_engine("xla")
        try:
            out = log_mel_spectrogram(feat_batch, 48000, n_mel=128,
                                      win_ms=40.0, hop_ms=10.0)
            float(np.asarray(out.ravel()[0]))
        finally:
            set_engine("auto")

    emit("features_logmel_b4_4s_default", _timeit(run_features_default),
         reference="lib.rs:449-458 hot loop (ML frontend)", reps=3)
    emit("features_logmel_b4_4s_xla", _timeit(run_features_xla),
         reference="XLA oracle path", reps=3)

    # (4c) adaptive multi-resolution viewport render (the reference's
    # unimplemented roadmap item, ReadMe.md:18): slice-local 3-scale
    # analysis + blend + crop render, as served by the viewer toggle
    def run_adaptive():
        img = mt.get_adaptive_spec_image_crop(0, 100.0, 300, 0.0, 12.0)
        int(img.ravel()[0])

    emit("adaptive_viewport_1200x300", _timeit(run_adaptive),
         reference="ReadMe.md:18 roadmap (no reference implementation)",
         reps=3)

    # (5) streaming long-file mode
    if not args.skip_hour:
        hour_sec = 60.0 if args.quick else 3600.0
        from bench import realistic_audio

        long_wav = realistic_audio(hour_sec)  # PCM16, wirepack-eligible
        fb = calc_mel_fb_default(48000, p.n_fft)

        def run_cfg5():
            db, nfr, lo, hi = streaming_spec_db(
                long_wav, p.win_length, p.hop_length, c, s, fb,
                chunk_frames=4096,
            )
            float(np.asarray(db.ravel()[0]))  # value fetch = honest sync

        # same methodology as bench.py (median of reps, value-fetch sync):
        # the old single-rep figure was one tunnel-weather sample and sat
        # 2-3x under the driver metric (VERDICT r2 #6)
        w = _timeit(run_cfg5)
        emit("cfg5_streaming_long_file", w,
             reference="BASELINE.json configs[4]",
             audio_seconds=hour_sec, reps=3,
             realtime_factor=round(hour_sec / w, 1))


if __name__ == "__main__":
    main()
