"""Mel filterbank tests (reference: mel.rs:101-166)."""

import numpy as np
import pytest

from msv_tpu.ops.mel import (
    calc_mel_fb,
    calc_mel_fb_default,
    hz_to_mel,
    mel_to_hz,
)


def test_mel_hz_convert_goldens():
    # mel.rs:107-113 (f64, eps 1e-14)
    assert abs(hz_to_mel(100.0) - 1.5) < 1e-14
    assert abs(hz_to_mel(1100.0) - 16.38629404765444) < 1e-14
    assert abs(mel_to_hz(1.0) - 66.66666666666667) < 1e-14
    assert abs(mel_to_hz(16.0) - 1071.1702874944676) < 1e-14


def test_mel_hz_roundtrip():
    f = np.linspace(0.0, 24000.0, 1001)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10, atol=1e-8)


def test_mel_fb_golden_vs_librosa():
    # mel.rs:115-133: first 8 row-major transposed weights of
    # calc_mel_fb(24000, 2048, 80, f64), hardcoded from librosa.  NOTE: the
    # reference's implementation (w /= w.sum(), mel.rs:80-82) does NOT
    # reproduce these librosa values — its own golden test is stale at v0.
    # We pin them against our 'slaney' norm mode; 'sum' (the app behavior)
    # is pinned separately below.
    answer = [
        0.000000000000000000e00,
        6.613916251808404922e-03,
        1.322783250361680984e-02,
        1.984174735844135284e-02,
        2.105801925063133240e-02,
        1.444410253316164017e-02,
        7.830185815691947937e-03,
        1.216269447468221188e-03,
    ]
    fb = calc_mel_fb(24000, 2048, 80, 0.0, None, "slaney", np.float64)
    assert fb.shape == (1025, 80)
    got = fb.T.ravel()[: len(answer)]
    np.testing.assert_allclose(got, answer, atol=1e-8)


def test_mel_fb_sum_norm_is_app_behavior():
    # The app path (calc_mel_fb_default -> do_norm=True) normalizes every
    # non-empty filter to unit sum (mel.rs:80-82).
    fb = calc_mel_fb(24000, 2048, 80, 0.0, None, True, np.float64)
    sums = fb.sum(axis=0)
    np.testing.assert_allclose(sums[sums > 0], 1.0, atol=1e-12)
    fb_def = calc_mel_fb_default(24000, 1024)
    np.testing.assert_allclose(fb_def.sum(axis=0), 1.0, atol=1e-5)


@pytest.mark.parametrize("sr", [400, 1000, 8000, 16000, 24000, 44100, 48000, 96000])
def test_mel_default_maximal_feasible(sr):
    # mel.rs:135-165 property: auto n_mel has no empty filter AND n_mel+1 does.
    for n_fft_exp in range(5, 13):
        n_fft = 2**n_fft_exp
        fb = calc_mel_fb_default(sr, n_fft)
        assert (fb.sum(axis=0) > 0).all(), (sr, n_fft, fb.shape)
        if fb.shape[1] == fb.shape[0]:
            continue
        fb_fail = calc_mel_fb(sr, n_fft, fb.shape[1] + 1)
        assert (fb_fail.sum(axis=0) == 0).any(), (sr, n_fft, fb.shape)


def test_mel_fb_validation():
    with pytest.raises(ValueError):
        calc_mel_fb(24000, 2047, 80)
    with pytest.raises(ValueError):
        calc_mel_fb(24000, 2048, 0)


def test_mel_fb_fmin_fmax():
    """Explicit frequency bounds: no weight below fmin or above fmax."""
    sr, n_fft = 16000, 1024
    fb = calc_mel_fb(sr, n_fft, 40, 300.0, 6000.0, True, np.float64)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    assert fb[freqs < 290.0].sum() == 0.0
    assert fb[freqs > 6010.0].sum() == 0.0
    assert (fb.sum(axis=0) > 0).all()


def test_mel_fb_cross_validated_against_transformers():
    """INDEPENDENT oracle: transformers.audio_utils.mel_filter_bank
    (slaney scale + slaney norm) is a separate implementation of the same
    librosa semantics the reference cites (mel.rs:1).  f64 agreement to
    ~1e-16 pins our converters, breakpoints, and area norm to a codebase
    we did not write."""
    pytest.importorskip("transformers")
    from transformers.audio_utils import mel_filter_bank

    from msv_tpu.ops.mel import calc_mel_fb

    for sr, n_fft, n_mel in [(24000, 2048, 80), (48000, 2048, 128),
                             (8000, 512, 40), (44100, 4096, 229)]:
        ours = np.asarray(
            calc_mel_fb(sr, n_fft, n_mel, 0.0, None, do_norm="slaney",
                        dtype=np.float64)
        )
        ref = mel_filter_bank(
            num_frequency_bins=n_fft // 2 + 1, num_mel_filters=n_mel,
            min_frequency=0.0, max_frequency=sr / 2, sampling_rate=sr,
            norm="slaney", mel_scale="slaney",
        )
        assert np.abs(ours - ref).max() < 1e-14, (sr, n_fft, n_mel)
