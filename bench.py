"""Benchmark: end-to-end mel-spectrogram render throughput on one chip.

Primary metric (from BASELINE.json): wall-clock to render a 1-minute 48 kHz
stereo WAV to a colormapped image, reported as a real-time factor
(audio-seconds processed per wall-second).  The reference publishes no
numbers (BASELINE.md: its criterion harness is stale and doesn't compile at
v0), so ``vs_baseline`` is measured against the project's north-star target
of 50x real-time per chip (BASELINE.json.north_star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Run: python bench.py            (real TPU via the axon backend)
     python bench.py --quick    (shorter audio; CI smoke)
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def _make_wav(path: str, seconds: float, sr: int = 48000) -> None:
    from msv_tpu.io.audio import write_wav

    rng = np.random.default_rng(42)
    t = np.arange(int(sr * seconds)) / sr
    # speech-ish test signal: gliding harmonics + noise floor
    x = (
        0.4 * np.sin(2 * np.pi * (220 + 80 * np.sin(2 * np.pi * 0.25 * t)) * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)
    stereo = np.stack([x, 0.8 * x])
    write_wav(path, stereo, sr)


def bench_session(path: str, seconds: float, px_per_sec: float, height: int):
    """Full pipeline: decode -> STFT -> mel -> dB -> grey -> resize -> RGB."""
    from msv_tpu import MultiTrack

    t0 = time.perf_counter()
    mt = MultiTrack()
    mt.add_tracks([0], [path])
    t1 = time.perf_counter()
    img = mt.get_spec_image(0, px_per_sec, height)
    t2 = time.perf_counter()
    # interactive zoom re-render (cached spec, kernel relaunch only)
    img2 = mt.get_spec_image(0, px_per_sec * 0.8, height)
    t3 = time.perf_counter()
    return {
        "add_track_s": t1 - t0,
        "first_render_s": t2 - t1,
        "zoom_render_s": t3 - t2,
        "img_shape": list(img.shape),
        "img2_shape": list(img2.shape),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="5 s audio smoke run")
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--px-per-sec", type=float, default=100.0)
    ap.add_argument("--height", type=int, default=500)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    seconds = args.seconds or (5.0 if args.quick else 60.0)

    with tempfile.TemporaryDirectory() as td:
        warm_path = os.path.join(td, "warm.wav")
        bench_path = os.path.join(td, "bench.wav")
        _make_wav(warm_path, seconds)
        _make_wav(bench_path, seconds)

        # Warmup run compiles every shape bucket (identical shapes).
        bench_session(warm_path, seconds, args.px_per_sec, args.height)
        # Timed run.
        r = bench_session(bench_path, seconds, args.px_per_sec, args.height)

    total = r["add_track_s"] + r["first_render_s"]
    realtime = seconds / total
    n_frames = int(seconds * 48000 / 480)
    result = {
        "metric": "mel_spectrogram_render_realtime_factor_48k",
        "value": round(realtime, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(realtime / 50.0, 3),
        "audio_seconds": seconds,
        "add_track_s": round(r["add_track_s"], 4),
        "first_render_s": round(r["first_render_s"], 4),
        "zoom_render_s": round(r["zoom_render_s"], 4),
        "stft_frames_per_s": round(n_frames / r["add_track_s"], 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
