"""Spectral editing (ops/specedit.py).

The device program (framing -> windowed rDFT -> box gain/patch ->
masked inverse -> OLA) is pinned against a from-scratch float64 np.fft
oracle sharing only the host mask builder, plus semantic contracts: an
erased tone drops by the asked dB while a co-present tone outside the
box is untouched, a patched click vanishes into the surrounding tone,
and hostile geometry raises cleanly.
"""

import numpy as np
import pytest

from msv_tpu.ops.dft import n_pad_split
from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
from msv_tpu.ops.specedit import Box, _build_masks, spectral_edit
from msv_tpu.ops.windows import default_stft_window

WIN, HOP, NFFT = 512, 128, 512


def _oracle(wav, sr, boxes, win, hop, n_fft, feather_ms=20.0,
            feather_hz=60.0):
    """f64 np.fft mirror of the device pipeline (shares only the host
    mask geometry, which is pure numpy anyway)."""
    wav = np.asarray(wav, np.float32)
    half = win // 2
    window = default_stft_window(win, n_fft).astype(np.float64)
    pl, pr = n_pad_split(n_fft, win)
    n_frames = n_frames_for(len(wav), win, hop)
    n_freq = n_fft // 2 + 1
    pad = reflect_pad_center(wav, win).astype(np.float64)
    need = (n_frames - 1) * hop + win
    pad = np.pad(pad, (0, max(0, need - len(pad))))[:need]
    frames = np.stack([pad[i * hop:i * hop + win] for i in range(n_frames)])
    spec = np.fft.rfft(np.pad(frames * window, ((0, 0), (pl, pr))), axis=1)
    gain, patch_w, left, right, alpha, steps = _build_masks(
        boxes, sr, n_frames, n_freq, hop, n_fft,
        feather_t=max(int(round(feather_ms / 1000.0 * sr / hop)), 1),
        feather_f=max(int(round(feather_hz * n_fft / sr)), 1))
    mag = np.abs(spec)
    target = ((1.0 - alpha[:, None]) * mag[left]
              + alpha[:, None] * mag[right])
    nom = 2.0 * np.pi * hop / n_fft * np.arange(n_freq)[None, :]
    ph_l = np.angle(spec[left])
    dev = ph_l - np.angle(spec[np.maximum(left - 1, 0)]) - nom
    dev = dev - 2 * np.pi * np.round(dev / (2 * np.pi))
    ph = ph_l + steps[:, None] * (nom + dev)
    out_spec = ((1.0 - patch_w) * spec * gain
                + patch_w * target * np.exp(1j * ph))
    fr = np.fft.irfft(out_spec, n_fft, axis=1)[:, pl:pl + win] * window
    total = (n_frames - 1) * hop + win
    sig = np.zeros(total)
    wsq = np.zeros(total)
    for i in range(n_frames):
        sig[i * hop:i * hop + win] += fr[i]
        wsq[i * hop:i * hop + win] += window * window
    out = sig / np.maximum(wsq, 1e-24)
    return out[half:half + len(wav)].astype(np.float32)


def _two_tones(sr=16000, seconds=1.0):
    t = np.arange(int(sr * seconds)) / sr
    a = 0.4 * np.sin(2 * np.pi * 500 * t)
    b = 0.4 * np.sin(2 * np.pi * 3000 * t)
    return (a + b).astype(np.float32), a.astype(np.float32), b.astype(
        np.float32)


def _band_rms(x, sr, f0, f1):
    X = np.fft.rfft(np.asarray(x, np.float64))
    f = np.fft.rfftfreq(len(x), 1.0 / sr)
    sel = (f >= f0) & (f < f1)
    return np.sqrt((np.abs(X[sel]) ** 2).sum() * 2 / len(x) ** 2)


def test_matches_oracle(rng):
    """Mixed gain + patch boxes on tone+noise: device == f64 oracle."""
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 700 * np.arange(sr) / sr)
           + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    boxes = [Box(0.2, 0.4, 400, 1200, gain_db=-24.0),
             Box(0.6, 0.65, 0, 8000, mode="patch")]
    out = spectral_edit(wav, sr, boxes, win_length=WIN, hop_length=HOP,
                        n_fft=NFFT)
    ref = _oracle(wav, sr, boxes, WIN, HOP, NFFT)
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_erase_selectivity():
    """Erasing the 3 kHz tone's box drops it ~gain_db while the 500 Hz
    tone moves < 0.1 dB; outside the time span both are untouched."""
    sr = 16000
    wav, tone_a, tone_b = _two_tones(sr, 1.0)
    out = spectral_edit(
        wav, sr, [Box(0.25, 0.75, 2800, 3200, gain_db=-60.0)],
        win_length=WIN, hop_length=HOP, n_fft=NFFT)
    mid = slice(int(0.4 * sr), int(0.6 * sr))
    # the erased band inside the span: >= 50 dB down
    hi_in = _band_rms(out[mid], sr, 2800, 3200)
    hi_ref = _band_rms(wav[mid], sr, 2800, 3200)
    assert 20 * np.log10(hi_in / hi_ref) < -50.0
    # the kept tone inside the span: < 0.1 dB
    lo_in = _band_rms(out[mid], sr, 400, 600)
    lo_ref = _band_rms(wav[mid], sr, 400, 600)
    assert abs(20 * np.log10(lo_in / lo_ref)) < 0.1
    # outside the span (clear of the feather), both tones < 0.05 dB
    head = slice(int(0.05 * sr), int(0.18 * sr))
    for f0, f1 in ((400, 600), (2800, 3200)):
        r = _band_rms(out[head], sr, f0, f1) / _band_rms(
            wav[head], sr, f0, f1)
        assert abs(20 * np.log10(r)) < 0.05


def test_patch_removes_click():
    """A click inside a steady tone, patched across its span: the
    output is closer to the clean tone by >= 20 dB in the click span."""
    sr = 16000
    t = np.arange(sr) / sr
    clean = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = clean.copy()
    c0 = int(0.5 * sr)
    wav[c0:c0 + 32] += np.float32(0.8)  # broadband click
    out = spectral_edit(
        wav, sr, [Box(0.47, 0.53, 0, 7999, mode="patch")],
        win_length=WIN, hop_length=HOP, n_fft=NFFT)
    span = slice(int(0.46 * sr), int(0.54 * sr))
    err_in = np.sqrt(np.mean((wav[span] - clean[span]) ** 2))
    err_out = np.sqrt(np.mean((out[span] - clean[span]) ** 2))
    assert 20 * np.log10(err_out / err_in) < -20.0
    # away from the patch the signal is the plain roundtrip
    away = slice(int(0.1 * sr), int(0.3 * sr))
    assert np.abs(out[away] - clean[away]).max() < 1e-4


def test_validation_and_edges():
    sr = 8000
    wav = np.zeros(sr, np.float32)
    with pytest.raises(ValueError):
        spectral_edit(wav, sr, [])  # no boxes
    with pytest.raises(ValueError):
        Box(0.5, 0.2, 0, 100)  # reversed time
    with pytest.raises(ValueError):
        Box(0.0, 1.0, 500, 100)  # reversed band
    with pytest.raises(ValueError):
        Box(0.0, 1.0, 0, 100, mode="wat")
    with pytest.raises(ValueError):
        spectral_edit(wav, sr, [Box(0, 1, 4000, 4100)])  # above Nyquist
    with pytest.raises(ValueError):  # patch at the very start: no left
        spectral_edit(wav, sr, [Box(0.0, 0.1, 0, 100, mode="patch")])
    with pytest.raises(ValueError):  # overlapping patches
        spectral_edit(wav, sr, [Box(0.2, 0.4, 0, 100, mode="patch"),
                                Box(0.3, 0.5, 200, 300, mode="patch")])
    # dict boxes work, and a box fully past the end is a no-op vs the
    # roundtrip
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = spectral_edit(
        wav, sr, [{"t0": 0.1, "t1": 0.2, "f0": 200, "f1": 800,
                   "gain_db": -20}], win_length=WIN, hop_length=HOP)
    assert out.shape == wav.shape
    out2 = spectral_edit(wav, sr, [Box(2.0, 3.0, 0, 1000, -40)],
                         win_length=WIN, hop_length=HOP)
    rt = spectral_edit(wav, sr, [Box(0.0, 1e-4, 0, 1.0, 0.0)],
                       win_length=WIN, hop_length=HOP)
    np.testing.assert_allclose(out2, rt, atol=1e-6)
