"""spec_to_grey vs a scalar oracle port of display.rs:44-54."""

import jax.numpy as jnp
import numpy as np

from msv_tpu.render.grey import grey_height, spec_to_grey


def _spec_to_grey_oracle(spec, up_ratio, max_db, min_db):
    """Direct port of display.rs:44-54: from_fn over (width, height)."""
    f32 = np.float32
    n_frames, n_freq = spec.shape
    height = int(np.floor(f32(n_freq) * f32(up_ratio) + 0.5))
    out = np.zeros((height, n_frames), np.float32)
    for y in range(height):
        for x in range(n_frames):
            if y >= height - n_freq:
                db = spec[x, height - 1 - y]
                out[y, x] = min(max((db - min_db) / (max_db - min_db), 0.0), 1.0)
    return out


def test_spec_to_grey_matches_oracle(rng):
    spec = (rng.standard_normal((13, 9)) * 30 - 60).astype(np.float32)
    for up in (1.0, 1.7, 3.2):
        h = grey_height(9, up)
        got = np.asarray(
            spec_to_grey(jnp.asarray(spec), jnp.float32(-10.0),
                         jnp.float32(-90.0), height=h)
        )
        expect = _spec_to_grey_oracle(spec, up, -10.0, -90.0)
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, atol=1e-6)


def test_spec_to_grey_degenerate_range_is_zero_not_nan():
    """Silent/constant track: max_db == min_db.  Rust's .max(0.).min(1.)
    collapses the 0/0 NaN to grey 0 (display.rs:49); jnp.clip would
    propagate it and make the RGB cast backend-dependent."""
    spec = np.full((5, 4), -360.0, np.float32)
    got = np.asarray(
        spec_to_grey(jnp.asarray(spec), jnp.float32(-360.0),
                     jnp.float32(-360.0), height=4)
    )
    assert np.all(np.isfinite(got))
    np.testing.assert_array_equal(got, np.zeros((4, 5), np.float32))


def test_grey_height_rust_round():
    # f32 multiply then round-half-away (display.rs:45)
    assert grey_height(9, 1.0) == 9
    assert grey_height(10, 1.25) == 13  # 12.5 rounds away -> 13
    assert grey_height(257, 2.0) == 514
