"""dB spectrogram -> normalized grey image (reference: spec_to_grey,
display.rs:44-54).

grey[y, x] = clamp((db[x, f] - min) / (max - min), 0, 1) with the frequency
axis flipped (row 0 = highest frequency) and (height - n_freq) zero rows on
top, where height = rust_round(n_freq * up_ratio).  The up_ratio aligns
tracks with lower sample rates on the shared frequency axis
(lib.rs:231-248): max_sr/sr for linear scale, mel(max_sr/2)/mel(sr/2) for
mel scale.

Device-side: a fused elementwise normalize + flip + pad; stored as a (H, W)
f32 array that doubles as the resize GEMM operand.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.rounding import rust_round_np


def grey_height(n_freq: int, up_ratio: float) -> int:
    """rust_round(n_freq * up_ratio) as u32  (display.rs:45, f32 math)."""
    return int(rust_round_np(np.float32(n_freq) * np.float32(up_ratio)))


@functools.partial(jax.jit, static_argnames=("height",))
def spec_to_grey(spec, max_db, min_db, *, height: int):
    """(n_frames, n_freq) dB spec -> (height, n_frames) grey f32.

    ``max_db``/``min_db`` may be traced scalars (the session passes the
    device-resident global dB range so renormalization never leaves HBM).
    """
    n_frames, n_freq = spec.shape
    # Degenerate range guard: a silent/constant track makes max_db == min_db;
    # 0/0 would be NaN, which Rust's f32 .max(0.).min(1.) collapses to 0
    # (display.rs:49) but jnp.clip propagates — match the reference by
    # rendering grey 0 and keep the output deterministic across backends.
    rng = max_db - min_db
    safe = jnp.where(rng > 0, rng, 1.0)
    norm = jnp.clip(jnp.where(rng > 0, (spec - min_db) / safe, 0.0), 0.0, 1.0)
    img = jnp.flip(norm.T, axis=0)  # (n_freq, n_frames), row 0 = top freq
    if height < n_freq:
        raise ValueError("up_ratio must be >= 1 (height >= n_freq)")
    return jnp.pad(img, ((height - n_freq, 0), (0, 0)))
