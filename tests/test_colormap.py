"""Colormap tests (reference: display.rs:10-42, lib.rs:473-480)."""

import numpy as np

from msv_tpu.render.colormap import COLORMAP, get_colormap, grey_to_rgb_array


def _convert_grey_to_color_oracle(x: np.float32) -> np.ndarray:
    """Direct scalar port of convert_grey_to_color (display.rs:24-42)."""
    assert x >= 0
    position = np.float32(len(COLORMAP)) * np.float32(x)
    index = int(np.floor(position))
    if index >= len(COLORMAP) - 1:
        return COLORMAP[-1].copy()
    ratio = np.float32(position) - np.float32(index)
    a = COLORMAP[index].astype(np.float32)
    b = COLORMAP[index + 1].astype(np.float32)
    lerped = ratio * b + (np.float32(1.0) - ratio) * a
    return np.floor(lerped + 0.5).astype(np.uint8)  # .round() half-away


def test_colormap_dense_sweep():
    xs = np.linspace(0.0, 1.0, 2049, dtype=np.float32)
    got = np.asarray(grey_to_rgb_array(xs))
    expect = np.stack([_convert_grey_to_color_oracle(x) for x in xs])
    np.testing.assert_array_equal(got, expect)


def test_top_band_saturates():
    # display.rs:28-29: index >= 9 (x >= 0.9) returns the LAST stop flat.
    xs = np.asarray([0.9, 0.95, 1.0], dtype=np.float32)
    got = np.asarray(grey_to_rgb_array(xs))
    np.testing.assert_array_equal(got, np.tile(COLORMAP[-1], (3, 1)))


def test_stop_exact_values():
    # at exact stop positions k/10 (k<9) the color is the stop itself
    for k in range(9):
        got = np.asarray(grey_to_rgb_array(np.float32(k / 10.0)))
        np.testing.assert_array_equal(got, COLORMAP[k])


def test_get_colormap_bytes():
    b = get_colormap()
    assert len(b) == 30  # lib.rs:473-480: 10 stops * 3 bytes
    assert b == COLORMAP.tobytes()


def test_colorbar():
    from msv_tpu.render.colormap import colorbar

    cb = colorbar(10, 100)
    assert cb.shape == (100, 10, 3)
    # top row is in the saturated last-stop band, bottom row is stop 0
    np.testing.assert_array_equal(cb[0, 0], COLORMAP[-1])
    np.testing.assert_array_equal(cb[-1, 0], COLORMAP[0])
    # columns identical
    assert (cb == cb[:, :1, :]).all()
