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


def bench_streaming_hour(seconds: float):
    """North-star workload: long 48 kHz stereo file -> mel dB spectrogram
    via the HBM-resident streaming scan (BASELINE.json north_star)."""
    import numpy as np

    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db

    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)

    n = int(48000 * seconds)
    t = np.arange(n, dtype=np.float64) / 48000.0
    stereo = np.stack(
        [
            (0.3 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32),
            (0.1 * np.sin(2 * np.pi * 1337.0 * t)).astype(np.float32),
        ]
    )
    del t
    mono_f = stereo.sum(axis=0)  # sum-to-mono, like the session (lib.rs:42)
    # PCM16 transfer format, as a real 16-bit source file would provide:
    # halves the host->device bytes (the dominant cost at hour scale).
    mono = np.clip(mono_f * 32768.0, -32768, 32767).astype(np.int16)

    def run():
        db, nfr, lo, hi = streaming_spec_db(
            mono, p.win_length, p.hop_length, c, s, fb, chunk_frames=4096
        )
        db.block_until_ready()
        float(db[0, 0])  # force a value fetch so timing is honest
        return nfr

    nfr = run()  # warm/compile
    t0 = time.perf_counter()
    nfr = run()
    wall = time.perf_counter() - t0
    return wall, nfr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="short smoke run")
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--px-per-sec", type=float, default=100.0)
    ap.add_argument("--height", type=int, default=500)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    # -------- primary: north-star hour-scale streaming render ------------
    hour_sec = args.seconds or (60.0 if args.quick else 3600.0)
    wall, n_frames = bench_streaming_hour(hour_sec)
    realtime = hour_sec / wall

    # -------- secondary: interactive 1-minute session ---------------------
    sess_sec = 5.0 if args.quick else 60.0
    with tempfile.TemporaryDirectory() as td:
        warm_path = os.path.join(td, "warm.wav")
        bench_path = os.path.join(td, "bench.wav")
        _make_wav(warm_path, sess_sec)
        _make_wav(bench_path, sess_sec)
        bench_session(warm_path, sess_sec, args.px_per_sec, args.height)
        r = bench_session(bench_path, sess_sec, args.px_per_sec, args.height)

    sess_total = r["add_track_s"] + r["first_render_s"]
    result = {
        "metric": "mel_spectrogram_streaming_realtime_factor_48k",
        "value": round(realtime, 1),
        "unit": "x_realtime_per_chip",
        # north-star target: >= 50x realtime for a 1-hour 48 kHz file/chip
        "vs_baseline": round(realtime / 50.0, 3),
        "audio_seconds": hour_sec,
        "stft_frames_per_s": round(n_frames / wall, 1),
        "session_realtime_factor": round(sess_sec / sess_total, 2),
        "session_add_track_s": round(r["add_track_s"], 4),
        "session_first_render_s": round(r["first_render_s"], 4),
        "session_zoom_render_s": round(r["zoom_render_s"], 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
