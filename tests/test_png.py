"""PNG writer round-trip tests (io/png.py — the CLI/golden image sink)."""

import io

import numpy as np
import pytest


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (5, 7, 4),
                                   (1, 1, 3), (300, 2, 4), (2, 300)])
def test_encode_png_pil_roundtrip(shape, rng):
    """PIL (independent decoder) must reproduce every byte we encode,
    for grey / RGB / RGBA and degenerate geometries."""
    from PIL import Image

    from msv_tpu.io.png import encode_png

    img = rng.integers(0, 256, shape).astype(np.uint8)
    data = encode_png(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(back.reshape(img.shape), img)


def test_write_png(tmp_path, rng):
    from PIL import Image

    from msv_tpu.io.png import write_png

    img = rng.integers(0, 256, (16, 9, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


def test_encode_png_rejects_bad_input():
    from msv_tpu.io.png import encode_png

    with pytest.raises((ValueError, TypeError)):
        encode_png(np.zeros((4, 4, 2), np.uint8))  # 2 channels


def test_encode_levels_decode_identically(rng):
    """zlib level changes bytes, never pixels (PIL round-trip at both)."""
    import io

    from PIL import Image

    from msv_tpu.io.png import encode_png

    img = rng.integers(0, 256, (40, 60, 3)).astype("uint8")
    for level in (0, 2, 6, 9):
        back = np.asarray(Image.open(io.BytesIO(encode_png(img, level))))
        np.testing.assert_array_equal(back, img, err_msg=str(level))
