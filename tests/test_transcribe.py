"""Note transcription (ops/transcribe.py): melody recovery semantics +
structural round-trip of the from-scratch SMF writer."""

import numpy as np
import pytest

from msv_tpu.ops.transcribe import transcribe_notes, write_midi


def _tone(sr, f0, dur, amp=0.4):
    t = np.arange(int(dur * sr)) / sr
    env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.01)  # 10 ms ramps
    return (amp * env * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


def _read_midi(path):
    """Minimal from-scratch SMF reader (enough to pin the writer)."""
    data = open(path, "rb").read()
    assert data[:4] == b"MThd"
    ppq = int.from_bytes(data[12:14], "big")
    assert data[14:18] == b"MTrk"
    n = int.from_bytes(data[18:22], "big")
    buf = data[22:22 + n]
    i, tick, tempo_us = 0, 0, 500000
    notes, open_n = [], {}

    def varlen():
        nonlocal i
        v = 0
        while True:
            b = buf[i]
            i += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                return v

    while i < len(buf):
        tick += varlen()
        st = buf[i]
        i += 1
        if st == 0xFF:
            typ, ln = buf[i], buf[i + 1]
            i += 2
            if typ == 0x51:
                tempo_us = int.from_bytes(buf[i:i + 3], "big")
            i += ln
            if typ == 0x2F:
                break
        elif st & 0xF0 == 0xC0:
            i += 1
        else:
            d1, d2 = buf[i], buf[i + 1]
            i += 2
            sec = tick * tempo_us / 1e6 / ppq
            if st & 0xF0 == 0x90 and d2 > 0:
                open_n[d1] = (sec, d2)
            elif st & 0xF0 in (0x80, 0x90):
                s, v = open_n.pop(d1)
                notes.append({"start": s, "end": sec, "midi": d1,
                              "velocity": v})
    return notes


def test_melody_recovers():
    """A4 - C5 - E5 with gaps -> exactly three notes at the right
    pitches and times."""
    sr = 16000
    gap = np.zeros(int(0.15 * sr), np.float32)
    x = np.concatenate([
        gap, _tone(sr, 440.0, 0.5), gap, _tone(sr, 523.25, 0.5),
        gap, _tone(sr, 659.26, 0.5), gap,
    ])
    notes = transcribe_notes(x, sr)
    assert [nt["midi"] for nt in notes] == [69, 72, 76]
    starts = [0.15, 0.15 + 0.5 + 0.15, 0.15 + 2 * (0.5 + 0.15)]
    for nt, s0 in zip(notes, starts):
        assert abs(nt["start"] - s0) < 0.08, (nt, s0)
        assert abs((nt["end"] - nt["start"]) - 0.5) < 0.12, nt
        assert abs(nt["hz"] / 440.0 - 2 ** ((nt["midi"] - 69) / 12)) < 0.02
        assert 1 <= nt["velocity"] <= 127


def test_legato_pitch_change_splits():
    """440 -> 523 Hz with NO gap still splits at the pitch jump."""
    sr = 16000
    x = np.concatenate([_tone(sr, 440.0, 0.4), _tone(sr, 523.25, 0.4)])
    notes = transcribe_notes(x, sr, split_on_onsets=False)
    assert [nt["midi"] for nt in notes] == [69, 72]
    assert abs(notes[1]["start"] - 0.4) < 0.08


def test_min_duration_filters_blips():
    sr = 16000
    x = np.concatenate([
        np.zeros(int(0.2 * sr), np.float32), _tone(sr, 440.0, 0.03),
        np.zeros(int(0.2 * sr), np.float32), _tone(sr, 440.0, 0.5),
    ])
    notes = transcribe_notes(x, sr, min_note_ms=80.0)
    assert len(notes) == 1 and notes[0]["midi"] == 69
    assert notes[0]["start"] > 0.3  # the blip is gone


def test_louder_means_higher_velocity():
    sr = 16000
    quiet = transcribe_notes(_tone(sr, 440.0, 0.5, amp=0.05), sr)
    loud = transcribe_notes(_tone(sr, 440.0, 0.5, amp=0.8), sr)
    assert len(quiet) == 1 and len(loud) == 1
    assert loud[0]["velocity"] > quiet[0]["velocity"] + 10


def test_midi_roundtrip(tmp_path):
    notes = [
        {"start": 0.25, "end": 0.75, "midi": 60, "hz": 261.6,
         "velocity": 90},
        {"start": 0.75, "end": 1.5, "midi": 64, "hz": 329.6,
         "velocity": 110},
        {"start": 1.0, "end": 1.25, "midi": 67, "hz": 392.0,
         "velocity": 70},  # overlapping
    ]
    p = str(tmp_path / "out.mid")
    write_midi(p, notes, tempo_bpm=120.0, ppq=480)
    got = _read_midi(p)
    got.sort(key=lambda nt: (nt["start"], nt["midi"]))
    assert [nt["midi"] for nt in got] == [60, 64, 67]
    for a, b in zip(got, notes):
        assert abs(a["start"] - b["start"]) < 1e-3
        assert abs(a["end"] - b["end"]) < 1e-3
        assert a["velocity"] == b["velocity"]


def test_validation(tmp_path):
    with pytest.raises(ValueError):
        transcribe_notes(np.zeros((2, 100), np.float32), 8000)
    with pytest.raises(ValueError):
        transcribe_notes(np.zeros(8000, np.float32), 8000,
                         min_note_ms=-1.0)
    with pytest.raises(ValueError):
        transcribe_notes(np.zeros(8000, np.float32), 8000, pitch_tol=0.0)
    p = str(tmp_path / "x.mid")
    with pytest.raises(ValueError):
        write_midi(p, [], tempo_bpm=0.0)
    with pytest.raises(ValueError):
        write_midi(p, [], ppq=0)
    with pytest.raises(ValueError):
        write_midi(p, [{"start": 0, "end": 1, "midi": 200,
                        "velocity": 90}])
    with pytest.raises(ValueError):
        write_midi(p, [], program=-2)
    # silence -> no notes, and an empty-but-valid midi file
    assert transcribe_notes(np.zeros(16000, np.float32), 16000) == []
    write_midi(p, [])
    assert _read_midi(p) == []
