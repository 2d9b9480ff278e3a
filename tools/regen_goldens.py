"""Regenerate the golden image digests in tests/test_e2e_reference_samples.py.

Run on CPU in parity mode so digests are deterministic:
    python tools/regen_goldens.py
"""

import hashlib
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from msv_tpu import MultiTrack  # noqa: E402

SAMPLES = "/root/reference/samples"
NAMES = [
    "sample_8k.wav",
    "sample_16k.wav",
    "sample_22k05.wav",
    "sample_24k.wav",
    "sample_44k1.wav",
]


def main():
    paths = [os.path.join(SAMPLES, n) for n in NAMES]
    mt = MultiTrack()
    mt.add_tracks(list(range(len(paths))), paths)
    print("GOLDEN_SPEC = {")
    for i, n in enumerate(NAMES):
        img = mt.get_spec_image(i, 100.0, 500)  # default wire (grey8 LUT)
        d = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()[:16]
        print(f'    "{n}": "{d}",')
    print("}")
    print("GOLDEN_SPEC_RGB = {")
    for i, n in enumerate(NAMES):
        img = mt.get_spec_image(i, 100.0, 500, wire="rgb")  # reference-exact
        d = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()[:16]
        print(f'    "{n}": "{d}",')
    print("}")
    print("GOLDEN_WAV = {")
    for i, n in enumerate(NAMES):
        img = mt.get_wav_image(i, 100.0, 500, -1.0, 1.0)
        d = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()[:16]
        print(f'    "{n}": "{d}",')
    print("}")

    flac = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "fixtures", "sine440_8k.flac")
    mtf = MultiTrack()
    mtf.add_tracks([0], [flac])
    img = mtf.get_spec_image(0, 100.0, 200)
    d = hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()[:16]
    print(f'GOLDEN_FLAC_SPEC = "{d}"')


if __name__ == "__main__":
    main()
