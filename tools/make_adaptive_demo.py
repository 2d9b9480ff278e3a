"""Regenerate docs/images/adaptive_vs_standard.png.

Click train + steady 2.5 kHz tone — the classic adaptive-STFT demo:
transients want short analysis windows (sharp vertical lines), the tone
wants long ones (sharp horizontal line).  Top: standard single-window
spectrogram; bottom: the sharpness-blended multi-resolution view
(ops/multires.py) as served by the viewer's "adaptive" toggle.
"""

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image
    from scipy.io import wavfile

    from msv_tpu import MultiTrack

    sr = 16000
    t = np.arange(sr * 4) / sr
    sig = 0.35 * np.sin(2 * np.pi * 2500 * t).astype(np.float32)
    clicks = np.zeros_like(sig)
    clicks[:: sr // 3] = 0.9
    sig = (sig + clicks).astype(np.float32)
    wavfile.write(
        "/tmp/demo_adaptive.wav", sr,
        (np.clip(sig, -1, 1) * 32767).astype(np.int16),
    )

    mt = MultiTrack()
    mt.add_tracks([0], ["/tmp/demo_adaptive.wav"])
    std = mt.get_spec_image_crop(0, 150, 150, 0.0, 4.0)
    ada = mt.get_adaptive_spec_image_crop(0, 150, 150, 0.0, 4.0)
    sep = np.full((4, std.shape[1], 3), 255, np.uint8)
    img = np.concatenate([std, sep, ada], axis=0)
    Image.fromarray(img).save("docs/images/adaptive_vs_standard.png")
    print("saved", img.shape)


if __name__ == "__main__":
    main()
