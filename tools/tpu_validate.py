"""Post-change TPU validation: run when the axon tunnel is reachable.

Exercises the surfaces a CPU test mesh cannot: Mosaic VMEM behavior of
the Pallas kernel (parity f32 tile cap), the fused features fast route on
a real chip, and an adaptive viewport render — then prints one PASS line
per check.  Pair with a probe loop during tunnel outages (CLAUDE.md):

    timeout 1200 python tools/tpu_validate.py
"""

import time

import numpy as np


def main():
    import jax

    print("devices:", jax.devices())
    from scipy.io import wavfile

    from msv_tpu import MultiTrack
    from msv_tpu.config import set_engine, set_precision_mode

    rng = np.random.default_rng(0)
    sr = 48000
    wav = (rng.standard_normal(sr * 60) * 8000).astype(np.int16)
    wavfile.write("/tmp/tpu_validate_60s.wav", sr, wav)

    # 1) Pallas engine in PARITY mode: the f32 tile_f cap must hold
    #    (an auto pick of tf256/512 with f32 operands crashes scoped VMEM)
    set_engine("pallas")
    set_precision_mode("parity")
    mt = MultiTrack()
    t0 = time.perf_counter()
    mt.add_tracks([0], ["/tmp/tpu_validate_60s.wav"])
    img = mt.get_spec_image_crop(0, 100, 300, 0.0, 12.0)
    print("PASS pallas-parity", img.shape, round(time.perf_counter() - t0, 2))
    set_engine("auto")

    # 2) fused features fast route, device-resident batch
    import jax.numpy as jnp

    from msv_tpu.features import log_mel_spectrogram

    b = jnp.asarray(
        (rng.standard_normal((4, sr * 4)) * 0.3).astype(np.float32)
    )
    t0 = time.perf_counter()
    out = log_mel_spectrogram(b, sr, n_mel=128, win_ms=40.0, hop_ms=10.0)
    float(np.asarray(out.ravel()[0]))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = log_mel_spectrogram(b, sr, n_mel=128, win_ms=40.0, hop_ms=10.0)
    float(np.asarray(out.ravel()[0]))
    print("PASS features-fast cold", round(cold, 2), "warm",
          round(time.perf_counter() - t0, 3))

    # 3) adaptive viewport render
    t0 = time.perf_counter()
    a = mt.get_adaptive_spec_image_crop(0, 100, 300, 0.0, 12.0)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    a = mt.get_adaptive_spec_image_crop(0, 100, 300, 12.0, 24.0)
    print("PASS adaptive", a.shape, "cold", round(cold, 2), "warm",
          round(time.perf_counter() - t0, 3))


if __name__ == "__main__":
    main()
