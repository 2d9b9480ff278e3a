"""Automatic click repair (ops/declick.py).

Detection is pinned on synthetic ground truth (click trains at known
samples in tones and noise), repair on error-energy drop vs the clean
signal, and the no-click contract on clean material (identity return,
not an STFT roundtrip).
"""

import numpy as np
import pytest

from msv_tpu.ops.declick import declick, find_clicks


def _tone(sr, seconds, f=440.0, amp=0.4):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _add_clicks(wav, sr, times_s, width=3, amp=0.6, rng=None):
    out = wav.copy()
    for ts in times_s:
        i = int(ts * sr)
        sgn = 1.0 if rng is None else float(rng.choice([-1.0, 1.0]))
        out[i:i + width] += np.float32(sgn * amp)
    return out


def test_detection_hits_every_click(rng):
    sr = 16000
    clean = _tone(sr, 2.0)
    times = [0.31, 0.77, 1.24, 1.68]
    wav = _add_clicks(clean, sr, times, rng=rng)
    spans = find_clicks(wav, sr)
    assert len(spans) == len(times)
    for ts, (a, b) in zip(times, spans):
        i = int(ts * sr)
        assert a <= i < b, (ts, a, b)
        assert b - a < 0.01 * sr  # tight spans, not smears


def test_detection_in_noise(rng):
    """Clicks well above the noise floor are found without drowning in
    false alarms; pure noise yields none at the default threshold."""
    sr = 16000
    noise = (0.05 * rng.standard_normal(2 * sr)).astype(np.float32)
    assert find_clicks(noise, sr) == []
    wav = _add_clicks(noise, sr, [0.5, 1.5], amp=0.8, rng=rng)
    spans = find_clicks(wav, sr)
    hit = [any(a <= int(ts * sr) < b for (a, b) in spans)
           for ts in (0.5, 1.5)]
    assert all(hit), spans
    assert len(spans) <= 4  # at most a couple of incidental flags


def test_repair_restores_tone(rng):
    sr = 16000
    clean = _tone(sr, 2.0)
    times = [0.4, 1.1, 1.55]
    wav = _add_clicks(clean, sr, times, rng=rng)
    out, spans, skipped = declick(wav, sr)
    assert len(spans) == len(times) and not skipped
    assert out.shape == wav.shape
    err_in = np.sqrt(np.mean((wav - clean) ** 2))
    err_out = np.sqrt(np.mean((out - clean) ** 2))
    assert 20 * np.log10(err_out / err_in) < -20.0
    # untouched away from every span
    mask = np.ones(len(wav), bool)
    for (a, b) in spans:
        mask[max(a - 512, 0):b + 512] = False
    assert np.abs(out[mask] - wav[mask]).max() < 1e-6


def test_clean_material_untouched(rng):
    """No clicks -> the IDENTICAL array back (no STFT roundtrip), for
    both a tone and filtered noise."""
    sr = 16000
    tone = _tone(sr, 1.0)
    out, spans, skipped = declick(tone, sr)
    assert spans == [] and skipped == []
    np.testing.assert_array_equal(out, tone)


def test_edge_clicks_reported_not_patched(rng):
    sr = 16000
    clean = _tone(sr, 1.0)
    wav = _add_clicks(clean, sr, [0.004, 0.5], rng=rng)
    out, spans, skipped = declick(wav, sr)
    # the edge click can't satisfy the patch's clean-frame requirement
    assert len(skipped) == 1 and skipped[0][0] < 0.01 * sr
    assert len(spans) == 1
    i = int(0.5 * sr)
    assert spans[0][0] <= i < spans[0][1]


def test_validation():
    sr = 16000
    with pytest.raises(ValueError):
        find_clicks(np.zeros((2, 100), np.float32), sr)
    with pytest.raises(ValueError):
        find_clicks(np.zeros(sr, np.float32), sr, thresh=0.5)
    assert find_clicks(np.zeros(100, np.float32), sr) == []  # too short
    z = np.zeros(sr, np.float32)  # digital silence: nothing to flag
    assert find_clicks(z, sr) == []


def test_real_music_detection_quality(reference_sample_paths):
    """Real-music regression (round-5): planted clicks in sample_44k1 are
    all found, and the local-contrast gate keeps false spans bounded (the
    ungated detector flagged 423 musical transients; a declick pass over
    CLEAN music must touch almost nothing)."""
    import wave

    w = wave.open(reference_sample_paths[-1])  # sample_44k1.wav
    sr = w.getframerate()
    clean = (np.frombuffer(w.readframes(sr * 10), np.int16)
             .astype(np.float32) / 32768.0)
    r = np.random.default_rng(11)
    times = np.sort(r.uniform(0.5, 9.5, 6))
    wav = clean.copy()
    for ts in times:
        i = int(ts * sr)
        wav[i:i + 3] += np.float32(r.choice([-1.0, 1.0]) * 0.5)
    spans = find_clicks(wav, sr)
    hits = sum(any(a <= int(ts * sr) < b for (a, b) in spans)
               for ts in times)
    assert hits == len(times), (hits, spans[:8])
    false = [s for s in spans
             if not any(s[0] <= int(ts * sr) < s[1] for ts in times)]
    assert len(false) <= 30, len(false)  # was ~200+/10 s ungated
    # clean-music pass: bounded touch count and zero edge skips
    out_c, rep_c, skip_c = declick(clean, sr)
    assert len(rep_c) <= 30 and skip_c == []
