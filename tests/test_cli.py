"""CLI surface tests (msv_tpu/cli.py — the shell analogue of the
reference's Electron main, SURVEY.md §1 L6)."""

import os

import numpy as np
import pytest

from msv_tpu.cli import main
from msv_tpu.io.audio import write_wav


@pytest.fixture()
def wav_path(tmp_path, rng):
    t = np.arange(8000) / 8000.0
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "tone.wav")
    write_wav(p, x[None], 8000)
    return p


def test_render_defaults(wav_path, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert main(["render", wav_path, "-o", out, "--px-per-sec", "50",
                 "--height", "100"]) == 0
    assert os.path.exists(os.path.join(out, "spec_tone.png"))
    assert os.path.exists(os.path.join(out, "wav_tone.png"))


def test_render_adaptive(wav_path, tmp_path):
    out = str(tmp_path / "out")
    assert main(["render", wav_path, "-o", out, "--adaptive", "--n-mel",
                 "48", "--px-per-sec", "40", "--height", "80"]) == 0
    assert os.path.exists(os.path.join(out, "spec_adaptive_tone.png"))


def test_render_engine_flags(wav_path, tmp_path):
    from msv_tpu.config import get_engine, set_engine

    out = str(tmp_path / "out")
    try:
        assert main(["render", wav_path, "-o", out, "--engine", "pallas",
                     "--no-wav", "--px-per-sec", "40", "--height", "80"]) == 0
    finally:
        set_engine("auto")


def test_info(wav_path, capsys):
    assert main(["info", wav_path]) == 0
    cap = capsys.readouterr().out
    assert "sr=8000" in cap and "win=320" in cap


def test_missing_file_error(tmp_path, capsys):
    assert main(["render", str(tmp_path / "no.wav"), "-o", str(tmp_path)]) == 1
    assert "error:" in capsys.readouterr().err


def test_render_time_crop(wav_path, tmp_path, capsys):
    """--start/--end renders a viewport crop, pixel-identical to slicing
    the full-width render."""
    from PIL import Image

    full = str(tmp_path / "full")
    crop = str(tmp_path / "crop")
    assert main(["render", wav_path, "-o", full, "--px-per-sec", "80"]) == 0
    assert main(["render", wav_path, "-o", crop, "--px-per-sec", "80",
                 "--start", "0.25", "--end", "0.75"]) == 0
    f = np.asarray(Image.open(os.path.join(full, "spec_tone.png")))
    c = np.asarray(Image.open(os.path.join(crop, "spec_tone.png")))
    c0, c1 = int(80 * 0.25), int(80 * 0.75)
    np.testing.assert_array_equal(c, f[:, c0:c1])
    fw = np.asarray(Image.open(os.path.join(full, "wav_tone.png")))
    cw = np.asarray(Image.open(os.path.join(crop, "wav_tone.png")))
    np.testing.assert_array_equal(cw, fw[:, c0:c1])


def test_render_time_crop_out_of_range(wav_path, tmp_path, capsys):
    """A window past the end of the track renders nothing (and writes no
    invalid zero-width PNG) instead of failing."""
    out = str(tmp_path / "oob")
    assert main(["render", wav_path, "-o", out, "--start", "100",
                 "--end", "200"]) == 0
    assert not os.path.exists(os.path.join(out, "spec_tone.png"))
    assert "nothing to render" in capsys.readouterr().out


def test_reconstruct_from_db_export(wav_path, tmp_path, capsys):
    """render --save-db -> reconstruct: the dB export comes back as a WAV
    whose dominant pitch is the source tone, at the original scale."""
    from msv_tpu.io.audio import open_audio_file

    out = str(tmp_path / "out")
    assert main(["render", wav_path, "-o", out, "--save-db",
                 "--no-wav"]) == 0
    npy = os.path.join(out, "db_tone.npy")
    assert os.path.exists(npy)
    recon = str(tmp_path / "recon.wav")
    assert main(["reconstruct", npy, "--sr", "8000", "-o", recon,
                 "--n-iter", "16"]) == 0
    assert "GL iters" in capsys.readouterr().out
    w, sr = open_audio_file(recon)
    assert sr == 8000 and w.shape[0] == 1
    y = w[0]
    f = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    assert abs(f.argmax() * sr / len(y) - 440.0) < 3.0
    # absolute scale preserved through dB -> amp -> GL (source rms 0.283)
    assert 0.2 < float(np.sqrt((y * y).mean())) < 0.35


def test_reconstruct_audio_roundtrip_and_normalize(wav_path, tmp_path):
    """Audio input runs the analysis->resynthesis roundtrip at the
    source length; --normalize peaks the output at 0.9."""
    from msv_tpu.io.audio import open_audio_file

    recon = str(tmp_path / "rt.wav")
    assert main(["reconstruct", wav_path, "-o", recon, "--n-iter", "8",
                 "--normalize"]) == 0
    w, sr = open_audio_file(recon)
    assert sr == 8000 and w.shape[1] == 8000  # exact source length
    assert abs(float(np.abs(w).max()) - 0.9) < 2e-4  # PCM16 quantization


def test_reconstruct_errors(wav_path, tmp_path, capsys):
    """Clean `error:` lines (exit 1), never tracebacks."""
    out = str(tmp_path / "out")
    assert main(["render", wav_path, "-o", out, "--save-db",
                 "--no-wav"]) == 0
    npy = os.path.join(out, "db_tone.npy")
    assert main(["reconstruct", npy]) == 1
    assert "--sr is required" in capsys.readouterr().err
    assert main(["reconstruct", npy, "--sr", "16000"]) == 1
    assert "wrong --sr" in capsys.readouterr().err
    assert main(["reconstruct", npy, "--sr", "8000",
                 "--momentum", "2"]) == 1
    assert "momentum" in capsys.readouterr().err
    assert main(["reconstruct", str(tmp_path / "nope.npy"),
                 "--sr", "8000"]) == 1
    assert "error:" in capsys.readouterr().err
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros(5, np.int32))
    assert main(["reconstruct", bad, "--sr", "8000"]) == 1
    assert "2-D float" in capsys.readouterr().err


def test_hpss_cli(wav_path, tmp_path, capsys):
    """hpss writes harmonic + percussive WAVs that sum to the input."""
    from msv_tpu.io.audio import open_audio_file

    out = str(tmp_path / "sep")
    assert main(["hpss", wav_path, "-o", out]) == 0
    assert "separated" in capsys.readouterr().out
    h, sr = open_audio_file(os.path.join(out, "tone_harmonic.wav"))
    p, _ = open_audio_file(os.path.join(out, "tone_percussive.wav"))
    x, _ = open_audio_file(wav_path)
    assert sr == 8000
    # sum reconstructs through PCM16 quantization (2/32768 per part)
    np.testing.assert_allclose(h[0] + p[0], x[0], atol=3e-4)
    # a pure tone is (almost) all harmonic
    assert float(np.sqrt(np.mean(p[0] ** 2))) < 0.02
    # error paths stay clean
    assert main(["hpss", wav_path, "-o", out, "--margin", "0.2"]) == 1
    assert main(["hpss", wav_path, "-o", out, "--channel", "5"]) == 1


def test_transcribe_cli(tmp_path, capsys):
    """transcribe writes a JSON note list + a parseable MIDI file."""
    sr = 16000
    t = np.arange(int(0.5 * sr)) / sr
    env = np.minimum(1.0, np.minimum(t, t[::-1]) / 0.01)
    x = np.concatenate([
        np.zeros(int(0.2 * sr), np.float32),
        (0.4 * env * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
        np.zeros(int(0.2 * sr), np.float32),
    ])
    p = str(tmp_path / "a4.wav")
    write_wav(p, x[None], sr)
    out = str(tmp_path / "notes")
    assert main(["transcribe", p, "-o", out]) == 0
    cap = capsys.readouterr().out
    assert "1 notes" in cap and "midi 69-69" in cap
    import json

    d = json.load(open(os.path.join(out, "notes_a4.json")))
    assert d["sr"] == sr and len(d["notes"]) == 1
    assert d["notes"][0]["midi"] == 69
    mid = open(os.path.join(out, "notes_a4.mid"), "rb").read()
    assert mid[:4] == b"MThd" and b"MTrk" in mid
    assert main(["transcribe", p, "-o", out, "--channel", "5"]) == 1


def test_separate_cli(wav_path, tmp_path, capsys):
    """separate writes K component WAVs that sum to the input, loudest
    first."""
    from msv_tpu.io.audio import open_audio_file

    out = str(tmp_path / "nmf")
    assert main(["separate", wav_path, "-o", out, "--components", "2",
                 "--iters", "40"]) == 0
    assert "2 components" in capsys.readouterr().out
    x, sr = open_audio_file(wav_path)
    parts = [open_audio_file(os.path.join(out, f"tone_part{k}.wav"))[0][0]
             for k in range(2)]
    assert sr == 8000
    np.testing.assert_allclose(parts[0] + parts[1], x[0], atol=3e-4)
    rms = [float(np.sqrt(np.mean(p ** 2))) for p in parts]
    assert rms[0] >= rms[1]  # loudest-first ordering
    # error paths stay clean
    assert main(["separate", wav_path, "-o", out, "--components",
                 "0"]) == 1
    assert main(["separate", wav_path, "-o", out, "--channel", "5"]) == 1


def test_stretch_cli(wav_path, tmp_path, capsys):
    """stretch writes duration-scaled / pitch-shifted WAVs."""
    from msv_tpu.io.audio import open_audio_file

    out = str(tmp_path / "fx")
    assert main(["stretch", wav_path, "-o", out, "--rate", "2"]) == 0
    y, sr = open_audio_file(os.path.join(out, "tone_x2.wav"))
    assert sr == 8000 and y.shape[1] == 4000  # half duration
    assert main(["stretch", wav_path, "-o", out, "--semitones", "12"]) == 0
    y, _ = open_audio_file(os.path.join(out, "tone_ps+12.wav"))
    assert y.shape[1] == 8000  # duration preserved
    mid = y[0][2000:6000] * np.hanning(4000)
    peak = np.argmax(np.abs(np.fft.rfft(mid))) * 8000 / 4000
    assert abs(peak - 880.0) < 5.0  # octave up
    # error paths stay clean: both/neither flags, bad rate
    assert main(["stretch", wav_path, "-o", out]) == 1
    assert "exactly one" in capsys.readouterr().err
    assert main(["stretch", wav_path, "-o", out, "--rate", "2",
                 "--semitones", "1"]) == 1
    assert main(["stretch", wav_path, "-o", out, "--rate", "-1"]) == 1
    assert "error:" in capsys.readouterr().err


def test_info_loudness(wav_path, capsys):
    """info --loudness appends the R128 figures (LUFS + LRA + dBTP);
    too-short files get a clean error."""
    assert main(["info", wav_path, "--loudness"]) == 0
    out = capsys.readouterr().out
    assert "loudness=" in out and "LUFS" in out
    lufs = float(out.split("loudness=")[1].split("LUFS")[0])
    assert -16.0 < lufs < -8.0  # 0.4 amplitude 440 Hz tone
    assert "dBTP" in out
    tp = float(out.split("peak=")[1].split("dBTP")[0])
    assert abs(tp - 20 * np.log10(0.4)) < 0.3  # ~-7.96 for the tone
    # steady tone: near-zero loudness range (if the file is >= 3 s)
    if "lra=" in out:
        assert float(out.split("lra=")[1].split("LU")[0]) < 1.0


def test_features_cli(wav_path, tmp_path, capsys):
    """Every kind writes a well-shaped .npy; resampling to the analysis
    rate matches the direct op path bit-for-bit."""
    out = str(tmp_path / "feats")
    for kind, check in [
        ("logmel", lambda a: a.ndim == 2 and a.shape[1] == 128),
        ("mfcc", lambda a: a.shape[1] == 13),
        ("chroma", lambda a: a.shape[1] == 12),
        ("spectral", lambda a: a.shape[1] == 6),
        ("whisper", lambda a: a.shape == (80, 3000)),
        ("f0", lambda a: a.shape[1] == 2 and 430 < np.median(a[:, 0]) < 450),
        ("onsets", lambda a: a.ndim == 1),
        ("beats", lambda a: a.ndim == 1),  # steady tone: no beats is fine
        ("tempogram", lambda a: a.ndim == 2 and a.shape[1] == 384),
        ("pcen", lambda a: a.shape[1] == 128 and np.all(a >= -1e-4)),
        ("tonnetz", lambda a: a.ndim == 2 and a.shape[1] == 6),
        ("key", lambda a: a.shape == (24,)),
        ("contrast", lambda a: a.ndim == 2 and a.shape[1] == 7),
        ("f0v", lambda a: a.shape[1] == 2 and np.all(
            np.abs(a[a[:, 1] > 0, 0] - 440.0) < 15.0)),
        ("segments", lambda a: a.ndim == 1),  # steady tone: none is fine
        ("mtspec", lambda a: a.ndim == 2 and a.shape[1] == 513
         # 440 Hz tone at 16 k / n_fft 1024 -> bin 28 dominates
         and int(np.argmax(np.median(a, axis=0))) == round(440 / 16000
                                                           * 1024)),
        ("reassigned", lambda a: a.ndim == 2 and a.shape[1] == 513
         and int(np.argmax(np.median(a, axis=0))) == round(440 / 16000
                                                           * 1024)),
    ]:
        assert main(["features", wav_path, "-o", out,
                     "--kind", kind]) == 0
        a = np.load(os.path.join(out, f"feats_{kind}_tone.npy"))
        assert a.dtype == np.float32 and check(a), (kind, a.shape)
    # bucketed resample == direct: recompute logmel from the op path
    from msv_tpu.features import log_mel_spectrogram
    from msv_tpu.io.audio import open_audio_file
    from msv_tpu.ops.resample import resample

    w, sr = open_audio_file(wav_path)
    x = np.asarray(resample(w.sum(axis=0), sr, 16000))
    direct = np.asarray(log_mel_spectrogram(x, 16000, n_mel=128))
    got = np.load(os.path.join(out, "feats_logmel_tone.npy"))
    np.testing.assert_array_equal(got, direct)


def test_features_beats_click_train(tmp_path, capsys):
    """--kind beats recovers a 120 BPM click train's tempo (printed) and
    writes the beat times in seconds."""
    sr = 8000
    dur = 8.0
    x = np.zeros(int(dur * sr), np.float32)
    clicks = np.arange(0.25, dur - 0.5, 0.5)
    for t0 in clicks:
        i = int(t0 * sr)
        x[i:i + 64] += 0.8 * np.hanning(64).astype(np.float32)
    p = str(tmp_path / "clicks.wav")
    write_wav(p, x[None], sr)
    out = str(tmp_path / "feats")
    assert main(["features", p, "-o", out, "--kind", "beats",
                 "--target-sr", str(sr)]) == 0
    cap = capsys.readouterr().out
    assert "BPM" in cap
    bpm = float(cap.split("BPM")[0].strip().split()[-1])
    assert abs(bpm - 120.0) / 120.0 < 0.05
    beats = np.load(os.path.join(out, "feats_beats_clicks.npy"))
    off = np.abs(beats[:, None] - clicks[None, :]).min(axis=1)
    assert np.median(off) <= 0.03


def test_trim_cli(tmp_path, capsys):
    """msv_tpu trim strips edge silence; --split writes one file per
    sound block."""
    from msv_tpu.io.audio import open_audio_file, write_wav

    sr = 8000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    x = np.concatenate([np.zeros(sr, np.float32), tone,
                        np.zeros(sr, np.float32), tone,
                        np.zeros(sr, np.float32)])
    p = str(tmp_path / "gappy.wav")
    write_wav(p, x[None], sr)
    out = str(tmp_path / "o")
    assert main(["trim", p, "-o", out]) == 0
    w, got_sr = open_audio_file(os.path.join(out, "gappy_trim.wav"))
    assert got_sr == sr
    # edges stripped (within a frame), interior gap kept
    assert abs(w.shape[1] - 3 * sr) <= 2 * 2048
    assert main(["trim", p, "-o", out, "--split"]) == 0
    w0, _ = open_audio_file(os.path.join(out, "gappy_part0.wav"))
    w1, _ = open_audio_file(os.path.join(out, "gappy_part1.wav"))
    for w in (w0, w1):
        assert abs(w.shape[1] - sr) <= 2 * 2048
    # all-silent input: message, no file
    ps = str(tmp_path / "quiet.wav")
    write_wav(ps, np.zeros((1, sr), np.float32), sr)
    assert main(["trim", ps, "-o", out]) == 0
    assert "all silent" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(out, "quiet_trim.wav"))


def test_analyze_cli(tmp_path, capsys):
    """msv_tpu analyze emits one coherent JSON report per file: a 440 Hz
    click-train tone reads its pitch, tempo and silence span right."""
    import json

    from msv_tpu.io.audio import write_wav

    sr = 8000
    dur = 6.0
    t = np.arange(int(dur * sr)) / sr
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    env = np.zeros_like(x)
    for c in np.arange(0.25, dur - 0.25, 0.5):  # 120 BPM pulses
        i = int(c * sr)
        env[i:i + 400] = np.linspace(1, 0.3, 400)
    x *= env
    x[: sr // 2] = 0.0  # leading silence
    p = str(tmp_path / "pulse.wav")
    write_wav(p, x[None], sr)

    assert main(["analyze", p]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["path"] == p and rep["sr"] == sr and rep["channels"] == 1
    assert abs(rep["duration_s"] - dur) < 1e-3
    assert -40 < rep["loudness_lufs"] < -5
    assert rep["true_peak_dbtp"] is not None
    assert abs(rep["true_peak_dbtp"] - 20 * np.log10(0.4)) < 0.5
    assert rep["loudness_range_lu"] is not None  # 6 s pulse train
    assert abs(rep["tempo_bpm"] - 120.0) < 6.0
    assert rep["n_beats"] >= 8
    assert rep["n_onsets"] >= 8
    # 50 ms pulses sparsely fill the 128 ms YIN window: voiced on the
    # pulse-filled frames only (silence frames read unvoiced, ap=1)
    assert 0.01 < rep["voiced_fraction"] < 0.5
    assert abs(rep["f0_median_hz"] - 440.0) < 15.0
    assert 0.3 < rep["active_s"][0] < 0.8  # leading silence stripped
    assert rep["active_s"][1] > 5.0  # last pulse starts at 5.25 s
    assert 300 < rep["spectral"]["centroid_hz"] < 900
    # defect scan: hard rectangular pulse edges ARE discontinuities (the
    # fixture gates a sine on/off instantly), so the detector correctly
    # reports up to ~two per pulse; bound it near the edge count
    assert 0 <= rep["n_clicks"] <= 30

    # -o writes a pretty file
    out = str(tmp_path / "rep")
    assert main(["analyze", p, "-o", out]) == 0
    capsys.readouterr()  # drain the "wrote <dest>" line
    with open(os.path.join(out, "analysis_pulse.json")) as fh:
        rep2 = json.load(fh)
    for k in ("tempo_bpm", "f0_median_hz", "loudness_lufs"):
        assert rep2[k] == rep[k]

    # silence: clean degenerate report
    ps = str(tmp_path / "quiet.wav")
    write_wav(ps, np.zeros((1, sr), np.float32), sr)
    assert main(["analyze", ps]) == 0
    reps = json.loads(capsys.readouterr().out.strip())
    assert reps["loudness_lufs"] is None and reps["key"] is None
    assert reps["true_peak_dbtp"] is None
    assert reps["tempo_bpm"] == 0.0 and reps["voiced_fraction"] == 0.0
    assert reps["f0_median_hz"] is None


def test_analyze_key_endpointish(tmp_path, capsys):
    """A C major chord reports key C major through the CLI report."""
    import json

    from msv_tpu.io.audio import write_wav

    sr = 16000
    t = np.arange(2 * sr) / sr
    x = sum(0.25 * np.sin(2 * np.pi * f * t)
            for f in (261.63, 329.63, 392.0, 523.25)).astype(np.float32)
    p = str(tmp_path / "chord.wav")
    write_wav(p, x[None], sr)
    assert main(["analyze", p]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["key"]["tonic"] == "C" and rep["key"]["mode"] == "major"


def test_resample_cli(tmp_path, capsys):
    """msv_tpu resample converts all channels to the target rate; the
    tone survives at the same frequency and amplitude."""
    from msv_tpu.io.audio import open_audio_file, write_wav

    sr = 44100
    t = np.arange(2 * sr) / sr
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.25 * np.sin(2 * np.pi * 880 * t)]).astype(np.float32)
    p = str(tmp_path / "st.wav")
    write_wav(p, x, sr)
    out = str(tmp_path / "o")
    assert main(["resample", p, "--sr", "16000", "-o", out]) == 0
    dest = os.path.join(out, "st_sr16000.wav")
    assert os.path.exists(dest)
    y, sr2 = open_audio_file(dest)
    assert sr2 == 16000 and y.shape[0] == 2
    assert abs(y.shape[1] - 2 * 16000) <= 1
    for ch, (f_hz, amp) in enumerate([(440.0, 0.5), (880.0, 0.25)]):
        spec = np.abs(np.fft.rfft(y[ch] * np.hanning(y.shape[1])))
        hz = spec.argmax() * 16000 / y.shape[1]
        assert abs(hz - f_hz) < 2.0
        assert abs(float(np.abs(y[ch]).max()) - amp) < 0.02

    # --channel picks one source channel
    assert main(["resample", p, "--sr", "8000", "--channel", "1",
                 "-o", out]) == 0
    y1, sr1 = open_audio_file(os.path.join(out, "st_ch1_sr8000.wav"))
    assert sr1 == 8000 and y1.shape[0] == 1
    spec = np.abs(np.fft.rfft(y1[0] * np.hanning(y1.shape[1])))
    assert abs(spec.argmax() * 8000 / y1.shape[1] - 880.0) < 2.0

    with pytest.raises(SystemExit):
        main(["resample", p])  # --sr required
    capsys.readouterr()


def test_gain_cli(tmp_path, capsys):
    """msv_tpu gain hits the LUFS target; --peak and --limit behave."""
    from msv_tpu.io.audio import open_audio_file, write_wav
    from msv_tpu.ops.loudness import integrated_loudness

    sr = 8000
    t = np.arange(3 * sr) / sr
    x = (0.05 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "q.wav")
    write_wav(p, x[None], sr)
    out = str(tmp_path / "o")
    assert main(["gain", p, "--lufs", "-20", "-o", out, "--bits", "32"]) == 0
    y, _ = open_audio_file(os.path.join(out, "q_norm.wav"))
    assert abs(integrated_loudness(y, sr) - (-20.0)) < 0.1
    capsys.readouterr()

    # target loud enough to clip: warns, --limit prevents it
    assert main(["gain", p, "--lufs", "0", "-o", out, "--bits", "32"]) == 0
    assert "WARNING: will clip" in capsys.readouterr().out
    assert main(["gain", p, "--lufs", "0", "--limit", "-o", out,
                 "--bits", "32"]) == 0
    assert "limited" in capsys.readouterr().out
    y, _ = open_audio_file(os.path.join(out, "q_norm.wav"))
    assert float(np.abs(y).max()) <= 0.9995

    # --peak mode
    assert main(["gain", p, "--peak", "0.5", "-o", out, "--bits", "32"]) == 0
    y, _ = open_audio_file(os.path.join(out, "q_norm.wav"))
    assert abs(float(np.abs(y).max()) - 0.5) < 1e-4
    capsys.readouterr()

    # silence: gated, nothing written
    ps = str(tmp_path / "z.wav")
    write_wav(ps, np.zeros((1, sr), np.float32), sr)
    out2 = str(tmp_path / "o2")
    assert main(["gain", ps, "-o", out2]) == 0
    assert "below the -70 LUFS gate" in capsys.readouterr().out
    assert not os.path.exists(os.path.join(out2, "z_norm.wav"))


def test_filter_cli(tmp_path, capsys):
    """msv_tpu filter: lowpass kills a high tone, EQ sections parse,
    stereo filters per channel, and no band spec is a clean error."""
    from msv_tpu.io.audio import open_audio_file

    sr = 16000
    t = np.arange(sr) / sr
    lo = 0.4 * np.sin(2 * np.pi * 200 * t)
    hi = 0.4 * np.sin(2 * np.pi * 5000 * t)
    p = str(tmp_path / "mix.wav")
    write_wav(p, np.stack([lo + hi, hi]).astype(np.float32), sr)
    out = str(tmp_path / "o")

    assert main(["filter", p, "-o", out, "--lowpass", "1000",
                 "--order", "6"]) == 0
    w, got_sr = open_audio_file(os.path.join(out, "mix_filt.wav"))
    assert got_sr == sr and w.shape[0] == 2
    spec0 = np.abs(np.fft.rfft(w[0, 2000:]))
    f = np.fft.rfftfreq(w.shape[1] - 2000, 1 / sr)
    assert spec0[np.argmin(np.abs(f - 5000))] < \
        spec0[np.argmin(np.abs(f - 200))] * 1e-3
    # channel 1 was pure 5 kHz: nearly silent after the lowpass
    assert np.max(np.abs(w[1, 2000:])) < 1e-3

    # EQ sections + zero-phase parse and run
    assert main(["filter", p, "-o", out, "--peak", "1000:6:2",
                 "--shelf", "hi:3000:-6", "--notch", "5000",
                 "--zero-phase"]) == 0

    # no band spec: clean MsvError, exit 1
    assert main(["filter", p, "-o", out]) == 1
    assert "at least one" in capsys.readouterr().err


def test_align_cli(tmp_path, capsys):
    """msv_tpu align prints per-file offsets; --write shifts copies
    onto the reference timeline."""
    from msv_tpu.io.audio import open_audio_file

    rng = np.random.default_rng(11)
    sr = 8000
    n = 6 * sr
    env = np.abs(np.convolve(rng.standard_normal(n),
                             np.hanning(sr // 2), "same"))
    env /= max(env.max(), 1e-9)
    x = (env * rng.standard_normal(n) * 0.3).astype(np.float32)
    d = int(0.5 * sr)
    b = np.concatenate([np.zeros(d, np.float32), x])[:n]
    pa, pb = str(tmp_path / "ref.wav"), str(tmp_path / "late.wav")
    write_wav(pa, x[None], sr)
    write_wav(pb, b[None], sr)
    out = str(tmp_path / "o")

    assert main(["align", pa, pb, "--max-lag", "3", "--write",
                 "-o", out]) == 0
    printed = capsys.readouterr().out
    assert "offset +0.500" in printed
    w, got_sr = open_audio_file(os.path.join(out, "late_aligned.wav"))
    assert got_sr == sr
    # head-trimmed by the offset: now in phase with the reference
    m = min(w.shape[1], n - d)
    ref = x[:m]
    num = float(np.dot(w[0, :m], ref))
    den = float(np.linalg.norm(w[0, :m]) * np.linalg.norm(ref)) or 1.0
    assert num / den > 0.95

    # reference alone: clean error
    assert main(["align", pa]) == 1


def test_denoise_cli(tmp_path, capsys):
    """msv_tpu denoise writes <stem>_dn.wav with the noise floor cut
    and the (bursty) signal preserved; bad spans error cleanly."""
    from msv_tpu.io.audio import open_audio_file

    rng = np.random.default_rng(12)
    sr = 8000
    n = 4 * sr
    t = np.arange(n) / sr
    duty = (np.floor(t * 4) % 2 == 0)
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * duty).astype(np.float32)
    wav = tone + (0.04 * rng.standard_normal(n)).astype(np.float32)
    p = str(tmp_path / "noisy.wav")
    write_wav(p, wav[None], sr)
    out = str(tmp_path / "o")

    assert main(["denoise", p, "-o", out]) == 0
    assert "rms drop" in capsys.readouterr().out
    w, got_sr = open_audio_file(os.path.join(out, "noisy_dn.wav"))
    assert got_sr == sr and w.shape == (1, n)
    # noise-only quarters drop hard, tone quarters survive
    off = slice(sr // 4 + 200, sr // 2 - 200)  # inside an off half-cycle
    on = slice(200, sr // 4 - 200)
    assert np.std(w[0, off]) < 0.4 * np.std(wav[off])
    assert np.std(w[0, on]) > 0.7 * np.std(wav[on])

    # span profiling drive + validation error path
    assert main(["denoise", p, "-o", out, "--noise-span", "0.3", "0.45",
                 "--smooth", "3"]) == 0
    assert main(["denoise", p, "-o", out, "--noise-span", "0.5",
                 "0.2"]) == 1
    assert "bad noise_span" in capsys.readouterr().err


def test_specedit_cli(tmp_path, capsys):
    """msv_tpu specedit writes <stem>_edit.wav with the boxed tone
    erased and the co-present tone kept; box syntax errors are clean."""
    from msv_tpu.io.audio import open_audio_file

    sr = 8000
    n = 2 * sr
    t = np.arange(n) / sr
    wav = (0.3 * np.sin(2 * np.pi * 500 * t)
           + 0.3 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
    p = str(tmp_path / "twotone.wav")
    write_wav(p, wav[None], sr)
    out = str(tmp_path / "o")

    assert main(["specedit", p, "-o", out,
                 "--box", "0.5:1.5:1800:2200:-60"]) == 0
    assert "1 edit(s)" in capsys.readouterr().out
    w, got_sr = open_audio_file(os.path.join(out, "twotone_edit.wav"))
    assert got_sr == sr and w.shape == (1, n)

    def band_rms(x, f0, f1):
        X = np.abs(np.fft.rfft(np.asarray(x, np.float64)))
        f = np.fft.rfftfreq(len(x), 1 / sr)
        return np.sqrt((X[(f >= f0) & (f < f1)] ** 2).sum())

    mid = slice(int(0.8 * sr), int(1.2 * sr))
    assert (band_rms(w[0, mid], 1800, 2200)
            < 0.02 * band_rms(wav[mid], 1800, 2200))
    assert (band_rms(w[0, mid], 400, 600)
            > 0.95 * band_rms(wav[mid], 400, 600))

    # patch box drives too; bad syntax and no-edit error cleanly
    assert main(["specedit", p, "-o", out,
                 "--patch", "0.9:1.0:0:3999"]) == 0
    assert main(["specedit", p, "-o", out]) == 1
    assert "no edits" in capsys.readouterr().err
    assert main(["specedit", p, "-o", out, "--box", "1:2"]) == 1
    assert "bad box" in capsys.readouterr().err
    assert main(["specedit", p, "-o", out, "--box", "2:1:0:100"]) == 1
    assert "bad box" in capsys.readouterr().err


def test_gain_true_peak_ceiling(tmp_path, capsys):
    """gain --max-dbtp: the output's true peak lands at (or under) the
    ceiling even when the LUFS target alone would push past it."""
    from msv_tpu.io.audio import open_audio_file
    from msv_tpu.ops.loudness import true_peak

    sr = 8000
    t = np.arange(4 * sr) / sr
    x = (0.1 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "quiet_tone.wav")
    write_wav(p, x[None], sr)
    out = str(tmp_path / "o")

    # a loud LUFS target would need ~+17 dB; the -6 dBTP ceiling binds
    assert main(["gain", p, "--lufs", "-6", "--max-dbtp", "-6.0",
                 "-o", out, "--bits", "32"]) == 0
    printed = capsys.readouterr().out
    assert "true-peak limited" in printed
    w, wsr = open_audio_file(os.path.join(out, "quiet_tone_norm.wav"))
    tp = true_peak(w, wsr)
    assert tp <= -5.9 and tp > -6.3  # at the ceiling, not far under

    # a ceiling that does not bind leaves the LUFS result alone
    assert main(["gain", p, "--lufs", "-30", "--max-dbtp", "-1",
                 "-o", out, "--bits", "32"]) == 0
    assert "true-peak limited" not in capsys.readouterr().out
