"""Byte-level pixel diff: the Rust reference's dumped images vs ours.

Closes the parity-evidence loop (docs/PARITY.md): every golden in this
repo is pinned against a from-scratch oracle, because no rustc exists in
the dev image.  On any rust-capable host the committed
tools/reference_dump.patch makes the reference itself write raw image
buffers (the multitrack_works pipeline, src_rust/lib.rs:516-546, minus
the PNG encode), and this differ renders the SAME five bundled samples
through msv_tpu and compares byte-for-byte:

    git clone https://github.com/Sytronik/multi-spectrogram-viewer thesia
    cd thesia && git apply /path/to/msv_tpu/tools/reference_dump.patch
    cargo test --release --test dump_parity -- --ignored --nocapture
    cd /path/to/msv_tpu
    python tools/reference_pixel_diff.py --dump /path/to/thesia/parity_dump \
        [--samples /path/to/thesia/samples]

Prints one report line per image (shape check, differing pixels, max
channel delta) plus the dB-window comparison, and exits nonzero if any
image differs by more than --tol (default 0: byte-exact).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR_STRINGS = ["8k", "16k", "22k05", "24k", "44k1"]


def run_diff(dump_dir: str, samples_dir: str, tol: int = 0,
             out=sys.stdout) -> int:
    from msv_tpu import MultiTrack

    with open(os.path.join(dump_dir, "manifest.json")) as f:
        man = json.load(f)
    height = int(man["height"])
    pps = float(man["px_per_sec"])

    ids = list(range(len(SR_STRINGS)))
    paths = [os.path.join(samples_dir, f"sample_{s}.wav")
             for s in SR_STRINGS]
    mt = MultiTrack()
    mt.add_tracks(ids, paths)

    failures = 0
    ddb = max(abs(mt.max_db - float(man["max_db"])),
              abs(mt.min_db - float(man["min_db"])))
    print(f"dB window: ours [{mt.min_db:.4f}, {mt.max_db:.4f}] vs "
          f"reference [{man['min_db']:.4f}, {man['max_db']:.4f}] "
          f"(|delta| {ddb:.2e})", file=out)
    if ddb > 1e-3:  # the session's own hysteresis epsilon (lib.rs:208)
        failures += 1

    entries = {e["sr"]: e for e in man["images"]}
    for tid, sr in zip(ids, SR_STRINGS):
        e = entries[sr]
        for kind, ch in (("spec", 3), ("wav", 4)):
            ref = np.fromfile(
                os.path.join(dump_dir, f"{kind}_{sr}.bin"), np.uint8)
            w = int(e[f"{kind}_w"])
            if ref.size != height * w * ch:
                print(f"{kind}_{sr}: BAD DUMP size {ref.size} != "
                      f"{height}x{w}x{ch}", file=out)
                failures += 1
                continue
            ref = ref.reshape(height, w, ch)
            if kind == "spec":
                ours = mt.get_spec_image(tid, pps, height, wire="rgb")
            else:
                ours = mt.get_wav_image(tid, pps, height, -1.0, 1.0)
            if ours.shape != ref.shape:
                print(f"{kind}_{sr}: SHAPE ours {ours.shape} != "
                      f"reference {ref.shape}", file=out)
                failures += 1
                continue
            d = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
            npx = int((d.max(axis=2) > tol).sum())
            status = "OK" if npx == 0 else "DIFF"
            print(f"{kind}_{sr}: {status}  shape {ref.shape}, "
                  f"{npx}/{height * w} px over tol={tol}, "
                  f"max channel delta {int(d.max())}", file=out)
            if npx:
                failures += 1
    print(("PARITY OK" if failures == 0
           else f"PARITY FAILURES: {failures}"), file=out)
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", required=True,
                    help="parity_dump dir written by the patched reference")
    ap.add_argument("--samples", default="/root/reference/samples",
                    help="dir with the 5 bundled sample_*.wav files")
    ap.add_argument("--tol", type=int, default=0,
                    help="max per-channel delta to accept (default 0)")
    args = ap.parse_args()
    sys.exit(1 if run_diff(args.dump, args.samples, args.tol) else 0)


if __name__ == "__main__":
    main()
