"""Benchmark: end-to-end mel-spectrogram render throughput on one chip.

Primary metric (from BASELINE.json): wall-clock to stream a 1-hour 48 kHz
file into a mel dB spectrogram, reported as a real-time factor
(audio-seconds processed per wall-second).  The reference publishes no
numbers (BASELINE.md: its criterion harness is stale and doesn't compile
at v0), so ``vs_baseline`` is measured against the project's north-star
target of 50x real-time per chip (BASELINE.json.north_star).

Methodology (round-2 fix): the hour workload runs 5 reps and reports
the MEDIAN, with min/max in the extras — the axon tunnel's bandwidth
varies ~2x between runs, and a single-shot number is whatever the tunnel
felt like that minute.  Timing ends in a device->host value fetch
(block_until_ready returns at enqueue on this relay, not completion).
The signal is realistic (harmonic stack + amplitude envelope + noise
floor), not a pure sine, so the wire codec's compression ratio is
representative of real audio.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Outage safety (round-4 fix; round 3 lost its claim of record when the
axon tunnel was dark and ``import jax`` -> backend init raised an
unhandled RuntimeError straight into the driver's log): the default
entry point is a PARENT process that never imports jax.  It

  1. probes the backend in a subprocess with a hard timeout, retrying a
     bounded number of times (the tunnel sometimes wakes mid-window);
  2. runs the actual measurement as a watchdog-timed child
     (``--child``), so a mid-run stall (transfers here can hang 2-4 min,
     outages 12 h+) cannot wedge the driver;
  3. on ANY failure — probe exhausted, child crash, child timeout —
     still prints one structured JSON line with an ``error`` field and
     exits 0, so the driver always records a parseable result.

Probe horizon (round-5 fix; the fixed 3-probe/9-minute loop of round 4
could not survive the 1-12 h outages CLAUDE.md documents and nulled two
rounds' claims of record): probing is TIME-BUDGETED — keep retrying until
MSV_BENCH_PROBE_BUDGET seconds (default 2700 = 45 min) have elapsed,
waiting MSV_BENCH_PROBE_WAIT (180 s) between attempts.  Setting
MSV_BENCH_PROBE_ATTEMPTS caps the attempt count instead (test hook /
manual runs).

Last-good sidecar (round-5 fix): every successful TPU measurement
persists its JSON (timestamped) to BENCH_LAST_GOOD.json next to this
file; every error line embeds that sidecar as ``last_good`` — so a
capture that lands in a dead window still carries the most recent
measured number instead of a bare null.  CPU-pinned runs (test hook)
never touch the sidecar.

Weather independence (round-5 fix): the child also measures a
device-resident, transfer-free hour (same compiled streaming program,
segments already in HBM) and reports ``compute_realtime_factor`` /
``kernel_frames_per_s`` extras — the number a kernel regression would
move, which the tunnel's 6.5x bandwidth spread cannot.

Env knobs: MSV_BENCH_PROBE_BUDGET (2700 s), MSV_BENCH_PROBE_ATTEMPTS
(unset = budget mode), MSV_BENCH_PROBE_TIMEOUT (120 s),
MSV_BENCH_PROBE_WAIT (180 s between attempts), MSV_BENCH_TIMEOUT (3600 s
child watchdog), MSV_BENCH_LAST_GOOD_PATH (sidecar override).
MSV_BENCH_FORCE_PROBE_FAIL=1 / MSV_BENCH_FORCE_CHILD_FAIL=1 force the
failure paths for tests.

Run: python bench.py            (real TPU via the axon backend)
     python bench.py --quick    (shorter audio; CI smoke)
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

import numpy as np

METRIC = "mel_spectrogram_streaming_realtime_factor_48k"
UNIT = "x_realtime_per_chip"


def _last_good_path() -> str:
    return os.environ.get(
        "MSV_BENCH_LAST_GOOD_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LAST_GOOD.json"))


def read_last_good():
    """The most recent successful measurement (dict) or None."""
    try:
        with open(_last_good_path()) as f:
            out = json.load(f)
        return out if isinstance(out, dict) and out.get("value") else None
    except (OSError, ValueError):
        return None


def write_last_good(result: dict) -> None:
    """Persist a successful measurement, atomically.  A --quick smoke
    number never overwrites a full-run record (but fills an empty
    sidecar: a quick TPU number beats none).  The sidecar keeps BOTH the
    most recent value (honest recency — the tunnel's weather swings the
    headline 6.5x between windows) and the best full-run value ever
    measured, with its own timestamp."""
    prev = read_last_good()
    if result.get("quick") and prev is not None and not prev.get("quick"):
        return
    out = dict(result)
    out["captured_unix"] = round(time.time(), 1)
    out["captured_iso"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    # best_* track FULL-run records only — a quick smoke number filling an
    # empty sidecar must not masquerade as the best measured result
    if not out.get("quick"):
        best_v, best_iso = out["value"], out["captured_iso"]
        if prev is not None and not prev.get("quick"):
            pv = prev.get("best_value", prev.get("value"))
            if pv is not None and pv > best_v:
                best_v = pv
                best_iso = prev.get("best_iso", prev.get("captured_iso"))
        out["best_value"] = best_v
        out["best_iso"] = best_iso
    path = _last_good_path()
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, path)


def _error_line(error: str, **extras) -> str:
    out = {"metric": METRIC, "value": None, "unit": UNIT,
           "vs_baseline": None, "error": error}
    lg = read_last_good()
    if lg is not None:
        out["last_good"] = lg
    out.update(extras)
    return json.dumps(out)


def probe_backend(timeout_s: float) -> tuple[bool, str]:
    """Check that jax can init its default backend AND run one op,
    inside a subprocess (an outage can hang jax.devices() itself, so the
    probe must be killable from outside).  Returns (ok, detail)."""
    if os.environ.get("MSV_BENCH_FORCE_PROBE_FAIL"):
        return False, "forced by MSV_BENCH_FORCE_PROBE_FAIL"
    # test hook: pin the probe to a platform (CI probes 'cpu' so the
    # guard paths are testable without a live tunnel)
    plat = os.environ.get("MSV_BENCH_PROBE_PLATFORM")
    pin = (f"import jax; jax.config.update('jax_platforms', {plat!r})\n"
           if plat else "")
    code = pin + (
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()\n"
        "assert d, 'no devices'\n"
        "v = float(jnp.arange(8.0).sum())\n"
        "assert v == 28.0, v\n"
        "print('OK', d[0].platform, len(d))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout_s:.0f}s"
    if r.returncode == 0 and r.stdout.startswith("OK"):
        return True, r.stdout.strip()
    tail = (r.stderr or r.stdout).strip().splitlines()
    return False, tail[-1][:300] if tail else f"rc={r.returncode}"


def run_guarded(argv) -> int:
    """Parent mode: probe w/ retries, then run the measurement child
    under a watchdog.  Always prints one JSON line; always returns 0 —
    including when the CALLER gives up first: SIGTERM/SIGINT mid-probe
    or mid-child still emits the structured error line (with the
    last-good sidecar) before exiting, so a driver with a shorter
    timeout than the probe budget never records an empty capture."""
    import signal

    child_holder = [None]  # the --child Popen, killable from the handler

    def _bail(signum, frame):
        ch = child_holder[0]
        if ch is not None and ch.poll() is None:
            # don't orphan an hour-scale measurement onto the tunnel
            ch.kill()
        print(_error_line("terminated_by_caller", signal=int(signum)))
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _bail)
    signal.signal(signal.SIGINT, _bail)
    attempts_env = os.environ.get("MSV_BENCH_PROBE_ATTEMPTS")
    budget = float(os.environ.get("MSV_BENCH_PROBE_BUDGET", "2700"))
    probe_timeout = float(os.environ.get("MSV_BENCH_PROBE_TIMEOUT", "120"))
    probe_wait = float(os.environ.get("MSV_BENCH_PROBE_WAIT", "180"))
    child_timeout = float(os.environ.get("MSV_BENCH_TIMEOUT", "3600"))

    # Time-budgeted probe horizon: outages here run hours, so the loop
    # keeps probing for ``budget`` seconds (not a fixed attempt count) —
    # unless MSV_BENCH_PROBE_ATTEMPTS pins an explicit cap.
    deadline = time.monotonic() + budget
    detail = ""
    attempts = 0
    ok = False
    while True:
        attempts += 1
        ok, detail = probe_backend(probe_timeout)
        if ok:
            break
        label = (f"{attempts}/{attempts_env}" if attempts_env
                 else f"{attempts} ({max(0.0, deadline - time.monotonic()):.0f}s of budget left)")
        print(f"# probe {label} failed: {detail}", file=sys.stderr)
        if attempts_env is not None:
            if attempts >= int(attempts_env):
                break
        elif time.monotonic() + probe_wait >= deadline:
            break
        time.sleep(min(probe_wait, max(0.0, deadline - time.monotonic())))
    if not ok:
        print(_error_line("tpu_backend_unavailable",
                          probe_attempts=attempts,
                          probe_budget_s=None if attempts_env else budget,
                          probe_detail=detail))
        return 0

    cmd = [sys.executable, os.path.abspath(__file__), "--child"] + argv
    try:
        # Popen (not run): the SIGTERM handler above must be able to kill
        # the measurement child instead of orphaning it onto the tunnel
        child = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                 stderr=subprocess.PIPE, text=True)
        child_holder[0] = child
        try:
            out, err = child.communicate(timeout=child_timeout)
        except subprocess.TimeoutExpired:
            child.kill()
            out, err = child.communicate()
            print(_error_line("bench_timeout", timeout_s=child_timeout,
                              partial_stdout=(out or "")[-300:]))
            return 0
        r = subprocess.CompletedProcess(cmd, child.returncode, out, err)
    finally:
        child_holder[0] = None
    sys.stderr.write(r.stderr)
    # the child prints exactly one JSON line last; relay it if parseable
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            print(line)
            return 0
    tail = (r.stderr or r.stdout).strip().splitlines()
    print(_error_line("bench_crashed", child_rc=r.returncode,
                      detail=(tail[-1][:300] if tail else "no output")))
    return 0


def realistic_audio(seconds: float, sr: int = 48000) -> np.ndarray:
    """Speech/music-like mono PCM16: vibrato harmonic stack, amplitude
    envelope (quiet passages), and a broadband noise floor.

    The fundamental's PHASE is the integral of the instantaneous frequency
    (carried across generation chunks), so f stays a true 140-300 Hz
    vibrato for the whole file.  The earlier ``sin(2*pi*f0(t)*t)`` form
    had instantaneous frequency ``f0 + t*df0/dt`` — a chirp whose
    deviation grows with absolute time and aliases into near-noise at
    hour scale, which misrepresented both the spectrogram content and the
    wire-codec ratio of real tonal audio.  The -40 dB noise floor is kept:
    it, not the tone, sets the honest entropy floor (~10 bits/sample)."""
    rng = np.random.default_rng(42)
    n = int(sr * seconds)
    out = np.empty(n, np.int16)
    CH = sr * 60
    phase = 0.0
    for a in range(0, n, CH):
        b = min(n, a + CH)
        t = np.arange(a, b, dtype=np.float64) / sr
        f0 = 220.0 + 80.0 * np.sin(2 * np.pi * 0.25 * t)
        ph = phase + np.cumsum(2 * np.pi * f0 / sr)
        phase = ph[-1]
        env = 0.15 + 0.5 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.05 * t)) ** 2
        x = (0.5 * np.sin(ph)
             + 0.25 * np.sin(2 * ph)
             + 0.12 * np.sin(3 * ph))
        x = env * x + 0.01 * rng.standard_normal(b - a)
        out[a:b] = np.clip(np.round(x * 23000.0), -32768, 32767)
    return out


def _make_wav(path: str, seconds: float, sr: int = 48000) -> None:
    from msv_tpu.io.audio import write_wav

    rng = np.random.default_rng(42)
    t = np.arange(int(sr * seconds)) / sr
    f0 = 220 + 80 * np.sin(2 * np.pi * 0.25 * t)
    ph = np.cumsum(2 * np.pi * f0 / sr)  # true vibrato (see realistic_audio)
    x = (
        0.4 * np.sin(ph)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)
    stereo = np.stack([x, 0.8 * x])
    write_wav(path, stereo, sr)


def bench_session(path: str, seconds: float, px_per_sec: float, height: int,
                  render_reps: int = 3):
    """Full pipeline: decode -> STFT -> mel -> dB -> grey -> resize -> image.

    Renders ship the default grey8 wire (config.get_image_wire) — the
    format the viewer and CLI use.  Two zoom figures:

    * zoom_render_s — what the viewer shows after a zoom change: the
      VISIBLE viewport (1200 px) re-rendered at the new zoom via the crop
      API (its two-stage fetch paints this first; the margin prefetch is
      async and off the latency path).
    * zoom_full_render_s — the full-width image at the new zoom (the
      reference's get_spec_image re-render, benches/bench.rs:47-60).

    Render timings are medians of ``render_reps`` calls: the relay's
    bandwidth swings minute to minute and a single call is weather.
    """
    from msv_tpu import MultiTrack

    t0 = time.perf_counter()
    mt = MultiTrack()
    mt.add_tracks([0], [path])
    t1 = time.perf_counter()

    def med(fn):
        outs, walls = [], []
        for _ in range(render_reps):
            ta = time.perf_counter()
            outs.append(fn())
            walls.append(time.perf_counter() - ta)
        return outs[0], statistics.median(walls)

    img, first_s = med(lambda: mt.get_spec_image(0, px_per_sec, height))
    zpps = px_per_sec * 0.8
    view_px = 1200
    mid = seconds / 2.0
    half_sec = view_px / zpps / 2.0
    imgv, zoom_s = med(lambda: mt.get_spec_image_crop(
        0, zpps, height, mid - half_sec, mid + half_sec))
    img2, zoom_full_s = med(lambda: mt.get_spec_image(0, zpps, height))
    return {
        "add_track_s": t1 - t0,
        "first_render_s": first_s,
        "zoom_render_s": zoom_s,
        "zoom_full_render_s": zoom_full_s,
        "img_shape": list(img.shape),
        "imgv_shape": list(imgv.shape),
        "img2_shape": list(img2.shape),
    }


def bench_streaming_hour(seconds: float, reps: int):
    """North-star workload: long 48 kHz file -> mel dB spectrogram via the
    software-pipelined streaming scan + wire codec (BASELINE.json)."""
    import jax

    from msv_tpu.config import SpecSetting, derive_stft_params
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import streaming_spec_db

    p = derive_stft_params(48000, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(48000, p.n_fft)

    mono = realistic_audio(seconds)

    def run():
        db, nfr, lo, hi = streaming_spec_db(
            mono, p.win_length, p.hop_length, c, s, fb, chunk_frames=4096
        )
        # honest sync: a value FETCH (block_until_ready returns at enqueue
        # over the axon relay, not at completion)
        float(np.asarray(jax.device_get(db.ravel()[0])))
        return nfr

    nfr = run()  # warm/compile
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        try:
            nfr = run()
        except Exception as e:  # tunnel died mid-run: keep completed reps
            if walls:
                print(f"# hour rep failed after {len(walls)} good reps: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                break
            raise
        walls.append(time.perf_counter() - t0)
    return walls, nfr


def bench_compute_hour(seconds: float, reps: int):
    """Weather-independent extra: the same hour of frames through the SAME
    compiled streaming program, but with every operand already resident in
    HBM — no host->device transfer inside the timed region.  This is the
    number a kernel regression moves; the wire-dominated headline cannot
    see one through the tunnel's 6.5x bandwidth spread (BASELINE.md).

    One representative segment is shipped once (outside timing) and
    re-dispatched for every segment slot; compute time is value-invariant
    (static shapes).  The final fetch of one scalar syncs the in-order
    relay stream, so it covers every dispatched scan.
    """
    import jax
    import jax.numpy as jnp

    from msv_tpu.config import (SpecSetting, derive_stft_params,
                                get_precision_mode)
    from msv_tpu.ops.dft import windowed_dft_matrices
    from msv_tpu.ops.framing import n_frames_for
    from msv_tpu.ops.mel import calc_mel_fb_default
    from msv_tpu.ops.windows import default_stft_window
    from msv_tpu.parallel.streaming import _streaming_core, padded_slice

    sr = 48000
    p = derive_stft_params(sr, SpecSetting())
    window = default_stft_window(p.win_length, p.n_fft)
    c, s = windowed_dft_matrices(window, p.n_fft)
    fb = calc_mel_fb_default(sr, p.n_fft)
    win, hop = p.win_length, p.hop_length
    cf, sc = 4096, 8  # streaming_spec_db defaults: same compiled program

    n_samples = int(sr * seconds)
    n_frames = n_frames_for(n_samples, win, hop)
    seg_frames = cf * sc
    n_segs = -(-n_frames // seg_frames)
    seg_len = seg_frames * hop + (win - hop)
    src = realistic_audio(min(seconds, 400.0), sr)
    seg_np = padded_slice(src, 0, seg_len, win // 2, len(src))
    seg_dev = jax.device_put(seg_np)
    float(np.asarray(jax.device_get(seg_dev.ravel()[0])))  # transfer done

    c_d, s_d = jnp.asarray(np.asarray(c)), jnp.asarray(np.asarray(s))
    w_d = jnp.asarray(np.asarray(window, np.float32))
    fb_d = jnp.asarray(np.asarray(fb))
    mode = get_precision_mode()

    def run():
        out = None
        for _ in range(n_segs):
            out = _streaming_core(
                seg_dev, c_d, s_d, w_d, fb_d, jnp.int32(seg_frames),
                jnp.float32(2.0 ** -15), win=win, hop=hop, n_fft=p.n_fft,
                chunk_frames=cf, n_chunks=sc, use_mel=True, impl="dft",
                mode=mode)
        # in-order stream: this scalar is ready only after every scan
        float(np.asarray(jax.device_get(out[1])))

    run()  # warm (compile cache shared with the primary metric)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        walls.append(time.perf_counter() - t0)
    med = statistics.median(walls)
    return {
        "compute_realtime_factor": round(seconds / med, 1),
        "kernel_frames_per_s": round(n_frames / med),
        "compute_wall_median_s": round(med, 3),
        "compute_wall_min_s": round(min(walls), 3),
        "compute_wall_max_s": round(max(walls), 3),
        "compute_mode": mode,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="short smoke run")
    ap.add_argument("--seconds", type=float, default=None)
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument("--px-per-sec", type=float, default=100.0)
    ap.add_argument("--height", type=int, default=500)
    ap.add_argument("--child", action="store_true",
                    help="internal: run the measurement directly "
                         "(no probe/watchdog)")
    ap.add_argument("--no-guard", action="store_true",
                    help="alias for --child: skip probe + watchdog")
    args = ap.parse_args()

    if not (args.child or args.no_guard):
        argv = [a for a in sys.argv[1:] if a not in ("--child", "--no-guard")]
        sys.exit(run_guarded(argv))

    if os.environ.get("MSV_BENCH_FORCE_CHILD_FAIL"):
        raise RuntimeError("forced by MSV_BENCH_FORCE_CHILD_FAIL")
    if os.environ.get("MSV_BENCH_FORCE_CHILD_HANG"):
        time.sleep(600)  # test hook for the parent watchdog

    # test hook: pin the measurement to a platform (the axon sitecustomize
    # force-registers the TPU backend; only jax.config.update overrides it)
    plat = os.environ.get("MSV_BENCH_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    # -------- primary: north-star hour-scale streaming render ------------
    hour_sec = args.seconds or (60.0 if args.quick else 3600.0)
    # 5 reps: the tunnel's bandwidth swings 2-5x on minute timescales and
    # occasionally stalls transfers for minutes — a 5-rep median tolerates
    # two bad reps (a 3-rep median only one) and samples more weather
    reps = args.reps or (2 if args.quick else 5)
    walls, n_frames = bench_streaming_hour(hour_sec, reps)
    wall_med = statistics.median(walls)
    realtime = hour_sec / wall_med

    # -------- weather-independent extra: device-resident compute hour -----
    # (best-effort: a failure here must not void the primary metric)
    comp = {}
    try:
        comp = bench_compute_hour(hour_sec, max(2, min(reps, 3)))
    except Exception as e:
        comp = {"compute_error": f"{type(e).__name__}: {e}"[:200]}

    # -------- secondary: interactive 1-minute session ---------------------
    # (best-effort: a failure here must not void the primary metric)
    sess_sec = 5.0 if args.quick else 60.0
    sess_err = None
    try:
        with tempfile.TemporaryDirectory() as td:
            warm_path = os.path.join(td, "warm.wav")
            bench_path = os.path.join(td, "bench.wav")
            _make_wav(warm_path, sess_sec)
            _make_wav(bench_path, sess_sec)
            bench_session(warm_path, sess_sec, args.px_per_sec, args.height)
            r = bench_session(bench_path, sess_sec,
                              args.px_per_sec, args.height)
    except Exception as e:
        sess_err = f"{type(e).__name__}: {e}"[:200]
        r = None

    result = {
        "metric": "mel_spectrogram_streaming_realtime_factor_48k",
        "value": round(realtime, 1),
        "unit": "x_realtime_per_chip",
        # north-star target: >= 50x realtime for a 1-hour 48 kHz file/chip
        "vs_baseline": round(realtime / 50.0, 3),
        "audio_seconds": hour_sec,
        "hour_reps": len(walls),
        "hour_wall_median_s": round(wall_med, 2),
        "hour_wall_min_s": round(min(walls), 2),
        "hour_wall_max_s": round(max(walls), 2),
        "stft_frames_per_s": round(n_frames / wall_med, 1),
    }
    result.update(comp)
    import jax

    result["platform"] = jax.default_backend()
    if args.quick:
        result["quick"] = True
    if r is not None:
        sess_total = r["add_track_s"] + r["first_render_s"]
        result.update({
            "session_realtime_factor": round(sess_sec / sess_total, 2),
            "session_add_track_s": round(r["add_track_s"], 4),
            "session_first_render_s": round(r["first_render_s"], 4),
            "session_zoom_render_s": round(r["zoom_render_s"], 4),
            "session_zoom_full_render_s": round(r["zoom_full_render_s"], 4),
            "session_render_reps": 3,
        })
    else:
        result["session_error"] = sess_err
    # persist the claim of record: only genuine TPU measurements feed the
    # last-good sidecar (CPU-pinned runs are the guard tests' hook)
    if result["platform"] not in ("cpu",) and not plat:
        try:
            write_last_good(result)
        except OSError as e:
            print(f"# last-good sidecar write failed: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
