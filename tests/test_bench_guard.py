"""Forced-failure tests for bench.py's outage guard (round-4 VERDICT #1).

Round 3 lost its claim of record because ``python bench.py`` crashed with
an unhandled backend-init RuntimeError during a tunnel outage.  The guard
contract: bench.py ALWAYS prints exactly one parseable JSON line with the
metric name and exits 0 — value+vs_baseline on success, an ``error``
field on probe exhaustion / child crash / child hang.  These tests force
each failure path via env hooks; none of them needs a live TPU (the
probe is pinned to the CPU platform where a live backend is required).
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def run_bench(env_extra, timeout=180):
    env = dict(os.environ)
    # the guard paths never need a TPU; keep any jax subprocesses on CPU
    env.pop("JAX_PLATFORMS", None)
    # isolate from the repo's real BENCH_LAST_GOOD.json sidecar
    env.setdefault("MSV_BENCH_LAST_GOOD_PATH", "/nonexistent-dir/lg.json")
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH, "--quick"],
        capture_output=True, text=True, timeout=timeout, env=env,
    )


def parse_single_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines()
             if not ln.startswith("#")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {lines}"
    out = json.loads(lines[0])
    assert out["metric"] == "mel_spectrogram_streaming_realtime_factor_48k"
    return out


def test_probe_exhaustion_emits_structured_error_and_exit_0():
    r = run_bench({
        "MSV_BENCH_FORCE_PROBE_FAIL": "1",
        "MSV_BENCH_PROBE_ATTEMPTS": "2",
        "MSV_BENCH_PROBE_WAIT": "0",
    })
    assert r.returncode == 0, r.stderr
    out = parse_single_json_line(r.stdout)
    assert out["error"] == "tpu_backend_unavailable"
    assert out["value"] is None and out["vs_baseline"] is None
    assert out["probe_attempts"] == 2
    # the retry loop actually ran twice
    assert r.stderr.count("probe ") == 2


def test_child_crash_emits_structured_error_and_exit_0():
    r = run_bench({
        "MSV_BENCH_FORCE_CHILD_FAIL": "1",
        "MSV_BENCH_PROBE_PLATFORM": "cpu",
        "MSV_BENCH_PROBE_ATTEMPTS": "1",
    })
    assert r.returncode == 0, r.stderr
    out = parse_single_json_line(r.stdout)
    assert out["error"] == "bench_crashed"
    assert "MSV_BENCH_FORCE_CHILD_FAIL" in out["detail"]


def test_child_hang_hits_watchdog_and_exit_0():
    r = run_bench({
        "MSV_BENCH_FORCE_CHILD_HANG": "1",
        "MSV_BENCH_PROBE_PLATFORM": "cpu",
        "MSV_BENCH_PROBE_ATTEMPTS": "1",
        "MSV_BENCH_TIMEOUT": "3",
    })
    assert r.returncode == 0, r.stderr
    out = parse_single_json_line(r.stdout)
    assert out["error"] == "bench_timeout"
    assert out["timeout_s"] == 3.0


def test_probe_budget_mode_stops_at_deadline():
    """Without an explicit attempt cap, the probe loop is time-budgeted:
    a tiny budget with a nonzero wait stops after the deadline passes
    (outages run hours; the default budget is 45 min)."""
    r = run_bench({
        "MSV_BENCH_FORCE_PROBE_FAIL": "1",
        "MSV_BENCH_PROBE_BUDGET": "1",
        "MSV_BENCH_PROBE_WAIT": "0.6",
    })
    assert r.returncode == 0, r.stderr
    out = parse_single_json_line(r.stdout)
    assert out["error"] == "tpu_backend_unavailable"
    assert out["probe_budget_s"] == 1.0
    # 1 s budget / 0.6 s wait: 2-3 attempts, not 1 and not unbounded
    assert 2 <= out["probe_attempts"] <= 3, out


def test_error_line_embeds_last_good_sidecar(tmp_path):
    """A capture in a dead window still carries the most recent measured
    number: the sidecar rides every error line, timestamped."""
    lg = {"metric": "mel_spectrogram_streaming_realtime_factor_48k",
          "value": 412.5, "unit": "x_realtime_per_chip",
          "vs_baseline": 8.25, "captured_iso": "2026-08-20T10:00:00Z"}
    p = tmp_path / "lg.json"
    p.write_text(json.dumps(lg))
    r = run_bench({
        "MSV_BENCH_FORCE_PROBE_FAIL": "1",
        "MSV_BENCH_PROBE_ATTEMPTS": "1",
        "MSV_BENCH_LAST_GOOD_PATH": str(p),
    })
    assert r.returncode == 0, r.stderr
    out = parse_single_json_line(r.stdout)
    assert out["error"] == "tpu_backend_unavailable"
    assert out["last_good"]["value"] == 412.5
    assert out["last_good"]["captured_iso"] == "2026-08-20T10:00:00Z"


def test_last_good_quick_never_overwrites_full(tmp_path):
    """A --quick smoke number must not clobber a full-run record (but
    does fill an empty sidecar)."""
    sys.path.insert(0, os.path.dirname(BENCH))
    import bench

    p = tmp_path / "lg.json"
    old = os.environ.get("MSV_BENCH_LAST_GOOD_PATH")
    os.environ["MSV_BENCH_LAST_GOOD_PATH"] = str(p)
    try:
        quick = {"metric": bench.METRIC, "value": 10.0, "quick": True}
        full = {"metric": bench.METRIC, "value": 300.0}
        bench.write_last_good(quick)
        assert bench.read_last_good()["value"] == 10.0  # filled empty
        bench.write_last_good(full)
        assert bench.read_last_good()["value"] == 300.0
        bench.write_last_good(quick)
        assert bench.read_last_good()["value"] == 300.0  # not clobbered
        assert "captured_unix" in bench.read_last_good()
        # best-value retention: a later worse-weather full run keeps the
        # best full-run number (the headline swings 6.5x with weather)
        worse = {"metric": bench.METRIC, "value": 120.0}
        bench.write_last_good(worse)
        lg = bench.read_last_good()
        assert lg["value"] == 120.0  # honest recency
        assert lg["best_value"] == 300.0  # record retained
        better = {"metric": bench.METRIC, "value": 450.0}
        bench.write_last_good(better)
        lg = bench.read_last_good()
        assert lg["value"] == 450.0 and lg["best_value"] == 450.0
    finally:
        if old is None:
            os.environ.pop("MSV_BENCH_LAST_GOOD_PATH", None)
        else:
            os.environ["MSV_BENCH_LAST_GOOD_PATH"] = old


@pytest.mark.slow
def test_quick_bench_on_cpu_succeeds_end_to_end():
    """The success path: probe CPU, run the full --quick measurement in
    the child on CPU, relay its JSON.  Slow (~1-2 min of compiles)."""
    r = run_bench({
        "MSV_BENCH_PROBE_PLATFORM": "cpu",
        "MSV_BENCH_PROBE_ATTEMPTS": "1",
        "MSV_BENCH_PLATFORM": "cpu",
        "MSV_BENCH_TIMEOUT": "900",
    }, timeout=960)
    assert r.returncode == 0, r.stderr[-2000:]
    out = parse_single_json_line(r.stdout)
    assert out.get("error") is None
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert out["hour_reps"] >= 1


def test_sigterm_mid_probe_still_emits_json(tmp_path):
    """A caller with a shorter timeout than the probe budget (e.g. the
    driver during an outage) must still get one structured line: SIGTERM
    mid-probe prints the error (with any last-good sidecar) and exits 0."""
    import signal
    import time as _time

    lg = {"metric": "mel_spectrogram_streaming_realtime_factor_48k",
          "value": 222.0}
    p = tmp_path / "lg.json"
    p.write_text(json.dumps(lg))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "MSV_BENCH_FORCE_PROBE_FAIL": "1",
        "MSV_BENCH_PROBE_BUDGET": "600",
        "MSV_BENCH_PROBE_WAIT": "30",
        "MSV_BENCH_LAST_GOOD_PATH": str(p),
    })
    errf = tmp_path / "stderr.txt"
    with open(errf, "w") as ef:
        proc = subprocess.Popen(
            [sys.executable, BENCH, "--quick"], env=env,
            stdout=subprocess.PIPE, stderr=ef, text=True)
        # interpreter startup takes seconds under load: signal only once
        # the guard is demonstrably inside its probe loop
        for _ in range(600):
            if "probe 1" in errf.read_text():
                break
            _time.sleep(0.1)
        else:
            proc.kill()
            pytest.fail("probe loop never started")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    parsed = parse_single_json_line(out)
    assert parsed["error"] == "terminated_by_caller"
    assert parsed["last_good"]["value"] == 222.0


def test_sigterm_mid_child_kills_the_measurement(tmp_path):
    """SIGTERM while the measurement child runs: the parent must emit
    the structured line AND kill the child (an orphaned hour-scale run
    would keep burning the tunnel for up to MSV_BENCH_TIMEOUT)."""
    import signal
    import time as _time

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "MSV_BENCH_FORCE_CHILD_HANG": "1",
        "MSV_BENCH_PROBE_PLATFORM": "cpu",
        "MSV_BENCH_PROBE_ATTEMPTS": "1",
        "MSV_BENCH_LAST_GOOD_PATH": str(tmp_path / "lg.json"),
    })
    proc = subprocess.Popen(
        [sys.executable, BENCH, "--quick"], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

    def children_of(pid):
        out = subprocess.run(
            ["ps", "-o", "pid=", "--ppid", str(pid)],
            capture_output=True, text=True).stdout.split()
        return [int(p) for p in out]

    # wait for the hanging child to exist
    kids = []
    for _ in range(600):
        kids = children_of(proc.pid)
        if kids:
            break
        _time.sleep(0.1)
    assert kids, "measurement child never spawned"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 0
    parsed = parse_single_json_line(out)
    assert parsed["error"] == "terminated_by_caller"
    # the child must be gone (reparented zombies still vanish on reap)
    for _ in range(100):
        alive = [k for k in kids if os.path.isdir(f"/proc/{k}")
                 and "zombie" not in open(f"/proc/{k}/status").read()]
        if not alive:
            break
        _time.sleep(0.1)
    assert not alive, f"orphaned child pids still alive: {alive}"
