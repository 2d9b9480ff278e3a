"""tools/reference_bench.patch must keep applying cleanly to the
reference tree (BASELINE.md repair kit: the reference's criterion
harness is stale at v0 — bench.rs:86 3-arg spec_to_grey vs display.rs:44,
and a missing samples/sample.wav — so its CPU numbers can only be
produced after this patch on a rust-capable host)."""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATCH = os.path.join(REPO, "tools", "reference_bench.patch")
REFERENCE = "/root/reference"


def test_patch_applies_cleanly_to_reference(tmp_path):
    if not os.path.isdir(os.path.join(REFERENCE, "benches")):
        pytest.skip("reference tree not available")
    work = tmp_path / "ref"
    work.mkdir()
    shutil.copytree(os.path.join(REFERENCE, "benches"), work / "benches")
    subprocess.run(["git", "init", "-q", str(work)], check=True)
    r = subprocess.run(
        ["git", "-C", str(work), "apply", "--check", PATCH],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    # applying it really fixes the two staleness bugs
    subprocess.run(["git", "-C", str(work), "apply", PATCH], check=True)
    src = (work / "benches" / "bench.rs").read_text()
    assert "samples/sample.wav" not in src  # missing file no longer read
    assert "samples/sample_44k1.wav" in src
    # 4-arg spec_to_grey call with identity up_ratio
    assert ("spec_to_grey(spec.view(), 1.0, *spec.max().unwrap(), "
            "*spec.min().unwrap())") in src
