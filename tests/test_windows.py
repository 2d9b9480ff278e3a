"""Window function tests (reference: windows.rs:32-39)."""

import numpy as np

from msv_tpu.ops.windows import cosine_window, hann, default_stft_window


def test_hann_periodic_golden():
    # windows.rs:35-38: periodic hann(4) == [0, .5, 1, .5]
    np.testing.assert_allclose(
        hann(4, False), [0.0, 0.5, 1.0, 0.5], atol=1e-7
    )


def test_hann_symmetric_endpoints():
    w = hann(9, True)
    assert w[0] == 0.0
    np.testing.assert_allclose(w, w[::-1], atol=3e-7)  # symmetric
    np.testing.assert_allclose(w[4], 1.0, atol=1e-7)


def test_hann_periodic_matches_scipy():
    import scipy.signal

    for n in [16, 320, 1920]:
        np.testing.assert_allclose(
            hann(n, False),
            scipy.signal.get_window("hann", n, fftbins=True),
            atol=1e-6,
        )


def test_cosine_window_size_guard():
    import pytest

    with pytest.raises(ValueError):
        cosine_window(0.5, 0.5, 0.0, 0.0, 1, False)


def test_default_window_scaling():
    # lib.rs:138-140: window = hann(win, periodic) / n_fft
    w = default_stft_window(320, 512)
    np.testing.assert_allclose(w, hann(320, False) / 512.0, atol=1e-9)


def test_window_family_matches_scipy():
    import scipy.signal

    from msv_tpu.ops.windows import blackman, blackman_harris, hamming

    for ours, name in [(hamming, "hamming"), (blackman, "blackman"),
                       (blackman_harris, "blackmanharris")]:
        np.testing.assert_allclose(
            ours(128, False),
            scipy.signal.get_window(name, 128, fftbins=True),
            atol=1e-6,
        )
