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


DUMP_PATCH = os.path.join(REPO, "tools", "reference_dump.patch")


def test_dump_patch_applies_cleanly_to_reference(tmp_path):
    """tools/reference_dump.patch (the pixel-parity escrow kit) creates
    tests/dump_parity.rs in a pristine reference tree."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    work = tmp_path / "ref"
    work.mkdir()
    subprocess.run(["git", "init", "-q", str(work)], check=True)
    r = subprocess.run(
        ["git", "-C", str(work), "apply", "--check", DUMP_PATCH],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    subprocess.run(["git", "-C", str(work), "apply", DUMP_PATCH], check=True)
    src = (work / "tests" / "dump_parity.rs").read_text()
    assert "use thesia::MultiTrack;" in src
    assert "parity_dump" in src
    for sr in ("8k", "16k", "22k05", "24k", "44k1"):
        assert f'"{sr}"' in src


@pytest.mark.slow
def test_pixel_differ_detects_agreement_and_corruption(tmp_path, monkeypatch):
    """The differ machinery itself, end-to-end on this host: a dump
    generated from OUR renderer (standing in for the Rust-side dump)
    diffs to zero, and a single corrupted byte is flagged.  On a
    rust-capable host the same differ consumes the reference's real
    dump (tools/reference_dump.patch)."""
    import io
    import json
    import sys

    import numpy as np

    samples = "/root/reference/samples"
    if not os.path.isdir(samples):
        pytest.skip("reference samples not available")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import reference_pixel_diff as rpd

    from msv_tpu import MultiTrack

    ids = list(range(len(rpd.SR_STRINGS)))
    paths = [os.path.join(samples, f"sample_{s}.wav")
             for s in rpd.SR_STRINGS]
    mt = MultiTrack()
    mt.add_tracks(ids, paths)
    height, pps = 500, 100.0
    dump = tmp_path / "parity_dump"
    dump.mkdir()
    images = []
    for tid, sr in zip(ids, rpd.SR_STRINGS):
        spec = mt.get_spec_image(tid, pps, height, wire="rgb")
        wav = mt.get_wav_image(tid, pps, height, -1.0, 1.0)
        (dump / f"spec_{sr}.bin").write_bytes(spec.tobytes())
        (dump / f"wav_{sr}.bin").write_bytes(wav.tobytes())
        images.append({"sr": sr, "spec_w": spec.shape[1],
                       "wav_w": wav.shape[1], "height": height})
    (dump / "manifest.json").write_text(json.dumps({
        "px_per_sec": pps, "height": height,
        "max_db": float(mt.max_db), "min_db": float(mt.min_db),
        "images": images,
    }))
    buf = io.StringIO()
    assert rpd.run_diff(str(dump), samples, out=buf) == 0, buf.getvalue()
    assert "PARITY OK" in buf.getvalue()

    # flip one byte in one image: the differ must flag exactly that image
    p = dump / "spec_16k.bin"
    raw = bytearray(p.read_bytes())
    raw[12345] ^= 0x40
    p.write_bytes(bytes(raw))
    buf = io.StringIO()
    assert rpd.run_diff(str(dump), samples, out=buf) == 1
    assert "spec_16k: DIFF" in buf.getvalue()
