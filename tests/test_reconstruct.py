"""Spectrogram -> audio reconstruction (ops/reconstruct.py).

The reference ships InvRealFFT (realfft.rs:166-242) but no synthesis
path; griffin_lim + mel_to_linear close the loop from the session's
mel dB exports back to audio, entirely on device.
"""

import numpy as np
import pytest

from msv_tpu.config import SpecSetting, derive_stft_params
from msv_tpu.ops.mel import calc_mel_fb_default
from msv_tpu.ops.reconstruct import griffin_lim, mel_to_linear
from msv_tpu.ops.stft import perform_stft


def _params(sr=16000):
    return derive_stft_params(sr, SpecSetting())


def _spectral_convergence(y, mag, p):
    sy = np.abs(np.asarray(perform_stft(y, p.win_length, p.hop_length,
                                        p.n_fft)))
    n = min(len(sy), len(mag))
    return float(np.linalg.norm(sy[:n] - mag[:n]) /
                 np.linalg.norm(mag[:n]))


def test_griffin_lim_recovers_harmonic_signal():
    sr, p = 16000, _params()
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1850 * t)).astype(np.float32)
    mag = np.abs(np.asarray(perform_stft(x, p.win_length, p.hop_length,
                                         p.n_fft)))
    y = np.asarray(griffin_lim(mag, p.win_length, p.hop_length, p.n_fft,
                               n_iter=32))
    assert y.shape == x.shape and y.dtype == np.float32
    # consistent spectrogram: |STFT(y)| close to the target magnitude
    assert _spectral_convergence(y, mag, p) < 0.12
    # the reconstruction's dominant frequency is the fundamental
    f = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    assert abs(f.argmax() * sr / len(y) - 440.0) < 2.0


def test_griffin_lim_more_iterations_converge_further():
    sr, p = 16000, _params()
    t = np.arange(sr // 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)
    mag = np.abs(np.asarray(perform_stft(x, p.win_length, p.hop_length,
                                         p.n_fft)))
    errs = [
        _spectral_convergence(
            np.asarray(griffin_lim(mag, p.win_length, p.hop_length,
                                   p.n_fft, n_iter=k)), mag, p)
        for k in (2, 8, 32)
    ]
    assert errs[2] < errs[1] < errs[0]
    # momentum=0 (classic 1983 iteration) also converges
    e0 = _spectral_convergence(
        np.asarray(griffin_lim(mag, p.win_length, p.hop_length, p.n_fft,
                               n_iter=32, momentum=0.0)), mag, p)
    assert e0 < errs[0]


def test_griffin_lim_validation():
    p = _params()
    ok = np.ones((10, p.n_fft // 2 + 1), np.float32)
    with pytest.raises(ValueError, match="mag must be"):
        griffin_lim(ok[:, :5], p.win_length, p.hop_length, p.n_fft)
    with pytest.raises(ValueError, match="momentum"):
        griffin_lim(ok, p.win_length, p.hop_length, p.n_fft, momentum=1.0)
    with pytest.raises(ValueError, match="too few frames"):
        griffin_lim(ok[:2], p.win_length, p.hop_length, p.n_fft)


def test_mel_to_linear_least_squares():
    sr, p = 16000, _params()
    rng = np.random.default_rng(7)
    t = np.arange(sr // 2) / sr
    x = (0.4 * np.sin(2 * np.pi * 900 * t)
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    mag = np.abs(np.asarray(perform_stft(x, p.win_length, p.hop_length,
                                         p.n_fft)))
    fb = calc_mel_fb_default(sr, p.n_fft)
    mel = mag @ fb
    lin = np.asarray(mel_to_linear(mel, fb))
    assert lin.shape == mag.shape and (lin >= 0).all()
    # least squares: re-projecting reproduces the mel input (bound is
    # f32 GEMM noise + the clip-at-0, not the f64 pinv itself)
    assert (np.linalg.norm(lin @ fb - mel) / np.linalg.norm(mel)) < 2e-4
    # auto n_mel is near-complete -> the linear estimate is close too
    assert (np.linalg.norm(lin - mag) / np.linalg.norm(mag)) < 0.05
    with pytest.raises(ValueError, match="n_mel"):
        mel_to_linear(mel[:, :5], fb)


def test_mel_db_roundtrip_to_audio():
    """The full inversion chain on a session-convention export: mel dB
    (db_to_amp) -> linear magnitude -> Griffin-Lim -> audio with the
    right pitch.  This is the path a user takes from `get_spec_db` /
    `render --save-db` output back to sound."""
    from msv_tpu.ops.decibel import amp_to_db, db_to_amp
    import jax.numpy as jnp

    sr, p = 16000, _params()
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)  # C5
    mag = np.abs(np.asarray(perform_stft(x, p.win_length, p.hop_length,
                                         p.n_fft)))
    fb = calc_mel_fb_default(sr, p.n_fft)
    db = np.asarray(amp_to_db(jnp.asarray(mag @ fb)))  # what the session caches
    mel_amp = np.asarray(db_to_amp(jnp.asarray(db)))
    lin = np.asarray(mel_to_linear(mel_amp, fb))
    y = np.asarray(griffin_lim(lin, p.win_length, p.hop_length, p.n_fft,
                               n_iter=32))
    f = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = f.argmax() * sr / len(y)
    assert abs(peak_hz - 523.25) < 3.0
    # and the reconstruction carries real energy at that pitch
    assert float(np.sqrt(np.mean(y * y))) > 0.05
