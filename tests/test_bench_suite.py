"""bench_suite.py must keep running (SURVEY.md §4 implication #5:
"benches as first-class, kept compiling in CI" — the reference's own
criterion harness was stale and didn't compile at v0, its weakest spot).

Slow-marked: a full --quick --skip-hour pass on the CPU backend (~1-2
min of compiles) checking every workload emits a valid JSON line with a
positive wall.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPECTED = {
    "get_mel_spectrogram_1s_48k",
    "draw_spectrogram_100pxs_500px",
    "add_track_x6",
    "multitrack_get_spec_image",
}


@pytest.mark.slow
def test_bench_suite_quick_runs_every_workload():
    path = os.path.join(REPO, "bench_suite.py")
    code = (
        "import sys, runpy\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "sys.argv = ['bench_suite.py', '--quick', '--skip-hour']\n"
        f"runpy.run_path({path!r}, run_name='__main__')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1500, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(ln) for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    names = {d["workload"] for d in lines}
    missing = EXPECTED - names
    assert not missing, f"workloads missing from the suite: {missing}"
    for d in lines:
        assert d["wall_s"] > 0, d
