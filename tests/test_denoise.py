"""Stationary-noise reduction (ops/denoise.py).

The full device program (framing -> windowed rDFT -> noise-PSD
estimate -> subtraction gain -> median gain smoothing -> masked
inverse -> OLA) is pinned against a from-scratch numpy/np.fft oracle,
for both noise estimators.  Semantics are checked end-to-end: SNR of
tone+noise improves, a clean signal with a silent profile span passes
through untouched (the STFT/OLA roundtrip), and residual noise lands
at the reduction floor.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from msv_tpu.ops.denoise import denoise, wiener_gain
from msv_tpu.ops.dft import n_pad_split
from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
from msv_tpu.ops.windows import default_stft_window

WIN, HOP, NFFT = 512, 128, 512


def _oracle(wav, win, hop, n_fft, *, sr=None, noise_span=None,
            percentile=20.0, oversub=1.5, reduction_db=25.0,
            smooth_time=5):
    """From-scratch float64 np.fft mirror of ops/denoise.py."""
    wav = np.asarray(wav, np.float32)
    half = win // 2
    window = default_stft_window(win, n_fft).astype(np.float64)
    pl, pr = n_pad_split(n_fft, win)
    n_frames = n_frames_for(len(wav), win, hop)
    pad = reflect_pad_center(wav, win).astype(np.float64)
    need = (n_frames - 1) * hop + win
    pad = np.pad(pad, (0, max(0, need - len(pad))))[:need]
    frames = np.stack([pad[i * hop:i * hop + win] for i in range(n_frames)])
    spec = np.fft.rfft(np.pad(frames * window, ((0, 0), (pl, pr))), axis=1)
    power = (spec.real.astype(np.float32) ** 2
             + spec.imag.astype(np.float32) ** 2)
    if noise_span is not None:
        f0 = int(noise_span[0] * sr / hop)
        f1 = min(int(noise_span[1] * sr / hop), n_frames)
        npsd = power[f0:f1].mean(axis=0)
    else:
        pos = int(np.floor(percentile / 100.0 * (n_frames - 1)))
        npsd = np.sort(power, axis=0)[pos]
        npsd = npsd / -np.log1p(-percentile / 100.0)
    floor = 10.0 ** (-reduction_db / 20.0)
    g = np.clip(1.0 - oversub * npsd[None, :] / np.maximum(power, 1e-30),
                floor, 1.0).astype(np.float32)
    if smooth_time > 1:
        g = ndi.median_filter(g, size=(smooth_time, 1), mode="reflect")
    masked = spec * g
    fr = np.fft.irfft(masked, n_fft, axis=1)[:, pl:pl + win] * window
    total = (n_frames - 1) * hop + win
    sig = np.zeros(total)
    wsq = np.zeros(total)
    for i in range(n_frames):
        sig[i * hop:i * hop + win] += fr[i]
        wsq[i * hop:i * hop + win] += window * window
    out = sig / np.maximum(wsq, 1e-24)
    return out[half:half + len(wav)].astype(np.float32)


def _tone_noise(sr=16000, seconds=1.0, snr_amp=0.05, rng=None):
    n = int(sr * seconds)
    t = np.arange(n) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    noise = snr_amp * rng.standard_normal(n)
    return (tone + noise).astype(np.float32), tone.astype(np.float32)


# lengths where n_frames is an exact 128-bucket: no pad rows, so the
# device's median smoothing over the padded grid equals the oracle's
def _exact_bucket_len(n_frames=128):
    # n_frames_for: (L + 2*(WIN//2) - WIN)//HOP + 1 == n_frames
    return (n_frames - 1) * HOP


def test_matches_oracle_percentile():
    rng = np.random.default_rng(7)
    wav, _ = _tone_noise(seconds=_exact_bucket_len(128) / 16000, rng=rng)
    assert n_frames_for(len(wav), WIN, HOP) == 128
    got = denoise(wav, WIN, HOP, NFFT)
    want = _oracle(wav, WIN, HOP, NFFT)
    assert got.shape == wav.shape and got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_matches_oracle_span():
    rng = np.random.default_rng(8)
    sr = 16000
    n = _exact_bucket_len(256)
    sig = np.zeros(n, np.float32)
    t = np.arange(n) / sr
    sig[int(0.6 * sr):] = 0.5 * np.sin(2 * np.pi * 523.0 * t[int(0.6 * sr):])
    sig += 0.03 * rng.standard_normal(n).astype(np.float32)
    got = denoise(sig, WIN, HOP, NFFT, sr=sr, noise_span=(0.05, 0.55),
                  smooth_time=3, oversub=2.0, reduction_db=30.0)
    want = _oracle(sig, WIN, HOP, NFFT, sr=sr, noise_span=(0.05, 0.55),
                   smooth_time=3, oversub=2.0, reduction_db=30.0)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_matches_oracle_no_smoothing_any_length():
    """smooth_time=1 has no cross-frame coupling, so pad rows are inert
    and the oracle holds at a non-bucket-aligned length too."""
    rng = np.random.default_rng(9)
    wav, _ = _tone_noise(seconds=0.437, rng=rng)
    got = denoise(wav, WIN, HOP, NFFT, smooth_time=1)
    want = _oracle(wav, WIN, HOP, NFFT, smooth_time=1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_matches_oracle_smoothed_any_length():
    """Median smoothing at a NON-bucket length: the pad-row reflect
    remap keeps the device median equal to scipy mode='reflect' over
    the true rows, so the tail is not ducked (the bug this pins had
    max err 1.4e-2 concentrated in the last 1024 samples)."""
    rng = np.random.default_rng(13)
    wav, _ = _tone_noise(seconds=0.437, rng=rng)  # default CLI settings
    got = denoise(wav, WIN, HOP, NFFT, smooth_time=5)
    want = _oracle(wav, WIN, HOP, NFFT, smooth_time=5)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_snr_improves():
    """Bursty tone + noise: the blind estimator profiles the gaps, the
    tone survives, the noise drops -> >=8 dB SNR gain.  (A tone present
    in EVERY frame is stationary and would be gated as noise — the
    documented blind-estimator caveat; see module doc.)"""
    rng = np.random.default_rng(10)
    sr, n = 16000, 32000
    t = np.arange(n) / sr
    duty = (np.floor(t * 4) % 2 == 0)  # 125 ms on / 125 ms off
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * duty).astype(np.float32)
    wav = tone + (0.05 * rng.standard_normal(n)).astype(np.float32)

    def snr(x):
        err = x - tone
        return 10 * np.log10(np.sum(tone ** 2) / np.sum(err ** 2))

    out = denoise(wav, WIN, HOP, NFFT)
    assert snr(out) > snr(wav) + 8.0


def test_silent_profile_is_roundtrip_identity():
    """noise_span over digital silence -> unit gain everywhere -> the
    output is just the STFT/OLA roundtrip of the input."""
    sr = 16000
    n = sr
    t = np.arange(n) / sr
    sig = np.zeros(n, np.float32)
    sig[sr // 2:] = (0.4 * np.sin(2 * np.pi * 330 * t[sr // 2:])).astype(
        np.float32)
    out = denoise(sig, WIN, HOP, NFFT, sr=sr, noise_span=(0.0, 0.4),
                  smooth_time=1)
    np.testing.assert_allclose(out, sig, atol=1e-5)


def test_reduction_db_bounds_the_attenuation():
    """Pure stationary noise: the gain floor makes reduction_db a
    CEILING on the drop (g >= floor everywhere), while deeper floors
    give monotonically more attenuation.  (The drop undershoots the
    floor a little: exponential-power outliers clear the subtraction
    and keep gain > floor; median smoothing reclaims most of that.)"""
    rng = np.random.default_rng(11)
    noise = (0.1 * rng.standard_normal(32000)).astype(np.float32)

    def drop(**kw):
        out = denoise(noise, WIN, HOP, NFFT, **kw)
        return 20 * np.log10(np.std(noise) / max(np.std(out), 1e-12))

    d6 = drop(reduction_db=6.0)
    d25 = drop(reduction_db=25.0)
    assert d6 <= 7.0                     # floor caps the 6 dB request
    assert d25 > d6 + 6.0                # deeper floor, deeper cut
    assert 12.0 <= d25 <= 26.0           # large, bounded reduction


def test_wiener_gain_formula():
    import jax.numpy as jnp
    p = jnp.asarray([[1.0, 4.0, 0.25, 1e-32]], jnp.float32)
    n = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    g = np.asarray(wiener_gain(p, n, oversub=1.0, floor=0.1))
    np.testing.assert_allclose(g[0], [0.1, 0.75, 0.1, 0.1], atol=1e-6)


def test_validation():
    wav = np.zeros(4000, np.float32)
    with pytest.raises(ValueError, match="1-D"):
        denoise(np.zeros((2, 100), np.float32), WIN, HOP, NFFT)
    with pytest.raises(ValueError, match="too short"):
        denoise(np.zeros(10, np.float32), WIN, HOP, NFFT)
    with pytest.raises(ValueError, match="odd"):
        denoise(wav, WIN, HOP, NFFT, smooth_time=4)
    with pytest.raises(ValueError, match="percentile"):
        denoise(wav, WIN, HOP, NFFT, percentile=120.0)
    # 0 and 100 are poles of the bias correction (inf / silent no-op)
    with pytest.raises(ValueError, match="percentile"):
        denoise(wav, WIN, HOP, NFFT, percentile=0.0)
    with pytest.raises(ValueError, match="percentile"):
        denoise(wav, WIN, HOP, NFFT, percentile=100.0)
    with pytest.raises(ValueError, match="oversub"):
        denoise(wav, WIN, HOP, NFFT, oversub=0.0)
    with pytest.raises(ValueError, match="reduction_db"):
        denoise(wav, WIN, HOP, NFFT, reduction_db=-3.0)
    with pytest.raises(ValueError, match="needs sr"):
        denoise(wav, WIN, HOP, NFFT, noise_span=(0.0, 0.1))
    with pytest.raises(ValueError, match="bad noise_span"):
        denoise(wav, WIN, HOP, NFFT, sr=16000, noise_span=(0.3, 0.1))
    with pytest.raises(ValueError, match="at least 3"):
        denoise(wav, WIN, HOP, NFFT, sr=16000, noise_span=(0.0, 0.01))
