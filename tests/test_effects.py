"""Phase-vocoder effects (ops/effects.py): oracle parity + semantics.

The device vocoder is pinned frame-by-frame against a from-scratch f64
numpy oracle of the same spec (the textbook phase vocoder: linear
magnitude interpolation at fractional frame positions, nominal-plus-
wrapped-deviation phase accumulation, zero-padded final column).  The
forward spectra feeding both sides come from the SAME trusted GEMM path
(perform_stft, itself pinned elsewhere), so the comparison isolates
exactly the new math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from msv_tpu.ops.effects import (
    _pv_spec_core,
    _stretch_plan,
    _phase_tables,
    pitch_shift,
    time_stretch,
)
from msv_tpu.ops.stft import FRAME_BUCKET, _prepare, perform_stft

WIN, HOP, NFFT = 256, 64, 256


def _nearest_peak_np(m):
    """Loop oracle of the nearest-local-max assignment (ties left)."""
    k = len(m)
    prev = np.concatenate([[-np.inf], m[:-1]])
    nxt = np.concatenate([m[1:], [-np.inf]])
    peaks = np.flatnonzero((m > prev) & (m >= nxt))
    out = np.arange(k)
    if len(peaks) == 0:
        return out
    for i in range(k):
        d = np.abs(peaks - i)
        out[i] = peaks[np.argmin(d)]  # argmin ties to the left peak
    return out


def _pv_oracle(D, rate, hop, n_fft, phase_lock=False):
    """f64 loop oracle of the vocoder stage (no framing/synthesis)."""
    F, K = D.shape
    phi = 2.0 * np.pi * hop * np.arange(K) / n_fft
    steps = np.arange(0, F, rate, dtype=np.float64)
    Dp = np.concatenate([D.astype(np.complex128), np.zeros((2, K))], axis=0)
    acc = np.angle(Dp[0])
    out = np.zeros((len(steps), K), np.complex128)
    for i, st in enumerate(steps):
        a = int(st)
        alpha = st - a
        c0, c1 = Dp[a], Dp[a + 1]
        mag = (1 - alpha) * np.abs(c0) + alpha * np.abs(c1)
        if phase_lock:
            p = _nearest_peak_np(mag)
            a0 = np.angle(c0)
            out[i] = mag * np.exp(1j * (acc[p] + a0 - a0[p]))
        else:
            out[i] = mag * np.exp(1j * acc)
        d = np.angle(c1) - np.angle(c0) - phi
        d -= 2.0 * np.pi * np.round(d / (2.0 * np.pi))
        acc = acc + phi + d
    return out


def _device_spec(wav, rate, phase_lock=False):
    padded, c, s, n_frames, n_pad = _prepare(wav, WIN, HOP, NFFT, None,
                                             FRAME_BUCKET)
    sel, frac, s_true = _stretch_plan(n_frames, rate, FRAME_BUCKET)
    phi, table = _phase_tables(HOP, NFFT)
    lin = table[np.arange(len(sel)) % table.shape[0]]
    re, im = _pv_spec_core(
        jnp.asarray(padded), jnp.asarray(c), jnp.asarray(s),
        jnp.asarray(sel), jnp.asarray(frac), jnp.asarray(lin),
        jnp.asarray(phi), jnp.int32(n_frames), jnp.int32(s_true),
        win=WIN, hop=HOP, n_fft=NFFT, n_frames=n_pad, mode="parity",
        phase_lock=phase_lock,
    )
    return (np.asarray(re) + 1j * np.asarray(im))[:s_true], n_frames


@pytest.mark.parametrize("phase_lock", [False, True])
@pytest.mark.parametrize("rate", [0.5, 1.0, 1.37, 2.0])
def test_vocoder_matches_f64_oracle(rate, phase_lock):
    rng = np.random.default_rng(7)
    wav = rng.standard_normal(4000).astype(np.float32) * 0.3
    dev, n_frames = _device_spec(wav, rate, phase_lock)
    D = np.asarray(perform_stft(wav, WIN, HOP, NFFT))[:n_frames]
    want = _pv_oracle(D, rate, HOP, NFFT, phase_lock)
    assert dev.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(dev, want, atol=2e-4 * scale, rtol=0)


def _tone(freq, sr, dur, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _peak_hz(y, sr):
    y = y * np.hanning(len(y))
    mag = np.abs(np.fft.rfft(y))
    return np.argmax(mag) * sr / len(y)


@pytest.mark.parametrize("rate", [0.5, 2.0])
def test_time_stretch_tone(rate):
    sr = 8000
    wav = _tone(440.0, sr, 1.0)
    out = time_stretch(wav, rate)
    assert out.dtype == np.float32
    assert len(out) == int(round(len(wav) / rate))
    # pitch preserved: dominant bin within 2 Hz-bins of 440
    mid = out[len(out) // 4: -len(out) // 4]
    assert abs(_peak_hz(mid, sr) - 440.0) <= 2 * sr / len(mid)
    # energy preserved away from the edge taper
    rms_in = np.sqrt(np.mean(wav**2))
    rms_out = np.sqrt(np.mean(mid**2))
    assert abs(rms_out - rms_in) / rms_in < 0.15


def test_phase_lock_preserves_tone_energy():
    """Identity locking is the default for a reason: the plain per-bin
    accumulator lets reflect-pad transient frequency noise permanently
    decohere a tone's main-lobe bins (measured ~73% rms loss at rate
    0.5); locked output keeps the energy."""
    sr = 8000
    wav = _tone(440.0, sr, 1.0)
    rms_in = np.sqrt(np.mean(wav**2))

    def mid_rms(y):
        m = y[len(y) // 4: -len(y) // 4]
        return np.sqrt(np.mean(m**2))

    locked = mid_rms(time_stretch(wav, 0.5))
    plain = mid_rms(time_stretch(wav, 0.5, phase_lock=False))
    assert abs(locked - rms_in) / rms_in < 0.15
    assert plain < 0.5 * rms_in  # documents the plain-PV artifact


def test_time_stretch_identity_and_errors():
    wav = _tone(200.0, 8000, 0.25)
    out = time_stretch(wav, 1.0)
    np.testing.assert_array_equal(out, wav)
    with pytest.raises(ValueError, match="rate"):
        time_stretch(wav, 0.0)
    with pytest.raises(ValueError, match="rate"):
        time_stretch(wav, -2.0)
    with pytest.raises(ValueError, match="1-D"):
        time_stretch(wav.reshape(2, -1), 2.0)


@pytest.mark.parametrize("steps,factor", [(12, 2.0), (-12, 0.5)])
def test_pitch_shift_octaves(steps, factor):
    sr = 8000
    wav = _tone(440.0, sr, 1.0)
    out = pitch_shift(wav, sr, steps)
    assert len(out) == len(wav)
    mid = out[len(out) // 4: -len(out) // 4]
    want = 440.0 * factor
    assert abs(_peak_hz(mid, sr) - want) <= 2 * sr / len(mid) + 1.0


def test_pitch_shift_zero_is_identity():
    wav = _tone(330.0, 8000, 0.25)
    out = pitch_shift(wav, 8000, 0)
    np.testing.assert_array_equal(out, wav)
    with pytest.raises(ValueError, match="bins_per_octave"):
        pitch_shift(wav, 8000, 1, bins_per_octave=0)


def test_pitch_shift_semitone_accuracy():
    """A +7 semitone (perfect fifth) shift lands on 659.25 Hz from 440."""
    sr = 8000
    wav = _tone(440.0, sr, 1.5)
    out = pitch_shift(wav, sr, 7)
    mid = out[len(out) // 4: -len(out) // 4]
    want = 440.0 * 2 ** (7 / 12)
    assert abs(_peak_hz(mid, sr) - want) <= 2 * sr / len(mid) + 1.0


# ------------------------------------------------------------- trim/split

def _tone_gap_tone(sr=8000, amp=0.5):
    t = np.arange(sr) / sr
    tone = (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    return np.concatenate([tone, np.zeros(sr, np.float32), tone])


def test_split_finds_sound_blocks():
    from msv_tpu.ops.effects import split

    sr = 8000
    x = _tone_gap_tone(sr)
    iv = split(x, sr)
    assert iv.shape == (2, 2)
    # block edges within one frame of truth (centered 2048 frames)
    assert abs(iv[0, 0] - 0) <= 2048
    assert abs(iv[0, 1] - sr) <= 2048
    assert abs(iv[1, 0] - 2 * sr) <= 2048
    assert abs(iv[1, 1] - 3 * sr) <= 2048
    # intervals are ordered, non-overlapping, in-bounds
    assert iv[0, 1] <= iv[1, 0] and iv[-1, 1] <= len(x)


def test_split_oracle_rms(rng):
    """Device frame RMS == a direct numpy loop over the same centered
    frames."""
    from msv_tpu.ops.effects import _frame_rms
    from msv_tpu.ops.framing import n_frames_for, reflect_pad_center

    x = rng.standard_normal(5000).astype(np.float32) * 0.3
    win, hop = 1024, 256
    got = _frame_rms(x, win, hop)
    padded = reflect_pad_center(x, win)
    n = n_frames_for(len(x), win, hop)
    want = np.array([
        np.sqrt(np.mean(padded[i * hop: i * hop + win] ** 2))
        for i in range(n)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_split_top_db_threshold():
    from msv_tpu.ops.effects import split

    sr = 8000
    t = np.arange(sr) / sr
    loud = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    quiet = (0.005 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    x = np.concatenate([loud, quiet])  # -40 dB relative
    assert split(x, sr, top_db=60.0).shape[0] == 1  # keeps both (merged)
    iv = split(x, sr, top_db=20.0)
    assert iv.shape[0] == 1 and iv[0, 1] <= sr + 2048  # drops the quiet


def test_trim_roundtrip():
    from msv_tpu.ops.effects import trim

    sr = 8000
    x = _tone_gap_tone(sr)
    pad = np.zeros(sr // 2, np.float32)
    y = np.concatenate([pad, x, pad])
    out, (a, b) = trim(y, sr)
    assert np.shares_memory(out, y) or out.base is not None
    np.testing.assert_array_equal(out, y[a:b])
    # keeps the interior gap, strips only the edges
    assert abs(a - sr // 2) <= 2048 and abs(b - (sr // 2 + 3 * sr)) <= 2048


def test_trim_split_edge_cases():
    from msv_tpu.ops.effects import split, trim

    out, (a, b) = trim(np.zeros(1000, np.float32))
    assert len(out) == 0 and (a, b) == (0, 0)
    assert split(np.zeros(0, np.float32)).shape == (0, 2)
    # short clip (< frame_length) still works
    x = np.concatenate([np.zeros(300, np.float32),
                        0.5 * np.ones(300, np.float32)])
    iv = split(x, top_db=30.0, frame_length=2048)
    assert iv.shape[0] == 1
    with pytest.raises(ValueError):
        split(np.ones((2, 5), np.float32))
    with pytest.raises(ValueError):
        split(np.ones(10, np.float32), top_db=0.0)
    with pytest.raises(ValueError):
        split(np.ones(10, np.float32), hop_length=0)
