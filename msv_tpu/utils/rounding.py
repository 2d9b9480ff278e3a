"""Rounding helpers matching Rust float semantics.

The reference uses Rust's ``f32::round`` (round half AWAY from zero) and
``as usize`` / ``as u32`` casts (truncation toward zero) in several places
that directly affect pixel output:

- hop derivation        (lib.rs:44)
- grey image height     (display.rs:45)
- colormap u8 quantize  (display.rs:38)
- envelope column bounds and amp->px mapping (display.rs:72,93-94)
- image width ``as u32``(lib.rs:296,309)

numpy/jnp ``round`` is round-half-to-EVEN, so we provide explicit
half-away-from-zero implementations for both host (numpy) and device (jnp).
"""

import numpy as np


def rust_round_np(x):
    """Round half away from zero, like Rust ``f32::round`` (host/numpy)."""
    x = np.asarray(x)
    # NEP-50: python-float 0.5 does not upcast float32 arrays, so dtype is kept.
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def rust_round(x):
    """Round half away from zero for jnp arrays (device)."""
    import jax.numpy as jnp

    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def trunc_int(x) -> int:
    """Rust ``as usize`` / ``as u32`` float->int cast: truncate toward zero,
    clamping negatives to 0 (unsigned target)."""
    v = int(x)  # Python int() truncates toward zero
    return max(v, 0)
