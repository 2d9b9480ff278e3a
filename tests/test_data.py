"""Dataset pipeline (data.py): files -> fixed-shape device batches.

The reference has no dataset story (one decode per user gesture); this
pins the loader's contract — exact coverage, source-rate bucketing,
device resampling equal to the direct op path, error policy.
"""

import os

import numpy as np
import pytest

from msv_tpu.data import AudioBatcher, ClipMeta, extract_features
from msv_tpu.io.audio import write_wav

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture()
def mixed_paths(tmp_path, rng):
    """7 wavs across 3 source rates, distinct content, varied lengths."""
    paths = []
    for i, (sr, sec) in enumerate(
        [(8000, 0.3), (8000, 0.5), (8000, 0.7), (16000, 0.5),
         (16000, 0.2), (22050, 0.5), (22050, 0.6)]
    ):
        t = np.arange(int(sr * sec)) / sr
        x = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        p = str(tmp_path / f"clip{i}_{sr}.wav")
        write_wav(p, x[None], sr)
        paths.append(p)
    return paths


def test_covers_every_file_once_with_fixed_shapes(mixed_paths):
    b = AudioBatcher(mixed_paths, target_sr=16000, clip_seconds=0.5,
                     batch_size=2, workers=3)
    seen, shapes = [], set()
    for batch, metas in b:
        assert batch.ndim == 2 and batch.shape[0] == len(metas) <= 2
        shapes.add(batch.shape[1])
        assert len({m.sr for m in metas}) == 1  # sr-homogeneous batches
        seen.extend(m.path for m in metas)
    assert sorted(seen) == sorted(mixed_paths)  # each exactly once
    assert shapes == {8000}  # 0.5 s at 16 kHz from every source rate


def test_rows_match_direct_decode_resample(mixed_paths):
    """Every row equals pad/truncate at source rate + ops.resample —
    the loader adds no arithmetic of its own."""
    from msv_tpu.io.audio import open_audio_file
    from msv_tpu.ops.resample import resample

    rows = {}
    for batch, metas in AudioBatcher(mixed_paths, target_sr=16000,
                                     clip_seconds=0.5, batch_size=2):
        for row, m in zip(np.asarray(batch), metas):
            rows[m.path] = (row, m)
    for p in mixed_paths:
        wav2d, sr = open_audio_file(p)
        x = wav2d.sum(axis=0)
        want_len = int(round(0.5 * sr))
        trunc = len(x) > want_len
        x = (x[:want_len] if trunc
             else np.pad(x, (0, want_len - len(x))))
        direct = np.asarray(resample(x, sr, 16000))
        row, m = rows[p]
        np.testing.assert_array_equal(row, direct)
        assert m.truncated == trunc and m.n_channels == 1


def test_mixed_codecs_and_channel_selection():
    paths = [
        os.path.join(FIXDIR, "sine440_8k.flac"),
        os.path.join(FIXDIR, "sine440_8k.ogg"),
        os.path.join(FIXDIR, "sine440_16k.mp3"),
        os.path.join(FIXDIR, "duotone_8k_stereo.flac"),
    ]
    got = {}
    for batch, metas in AudioBatcher(paths, target_sr=16000,
                                     clip_seconds=0.4, batch_size=4,
                                     channel=0):
        for row, m in zip(np.asarray(batch), metas):
            got[os.path.basename(m.path)] = (row, m)
    assert len(got) == 4
    assert got["duotone_8k_stereo.flac"][1].n_channels == 2
    # a 440 Hz fixture stays 440 Hz through decode + resample
    row = got["sine440_8k.flac"][0]
    f = np.abs(np.fft.rfft(row * np.hanning(len(row))))
    assert abs(f.argmax() * 16000 / len(row) - 440.0) < 5.0


def test_error_policy(tmp_path, mixed_paths):
    junk = str(tmp_path / "junk.wav")
    with open(junk, "wb") as f:
        f.write(b"RIFFxxxxWAVEjunk")
    paths = mixed_paths[:2] + [junk]
    from msv_tpu.utils.errors import AudioReadError

    with pytest.raises(AudioReadError):
        list(AudioBatcher(paths, clip_seconds=0.3, batch_size=2))
    b = AudioBatcher(paths, clip_seconds=0.3, batch_size=2,
                     on_error="skip")
    seen = [m.path for _, metas in b for m in metas]
    assert sorted(seen) == sorted(mixed_paths[:2])
    assert len(b.errors) == 1 and b.errors[0][0] == junk


def test_drop_remainder(mixed_paths):
    b = AudioBatcher(mixed_paths, clip_seconds=0.5, batch_size=2,
                     drop_remainder=True)
    for batch, metas in b:
        assert batch.shape[0] == 2
    # 3 files at 8 k, 2 at 16 k, 2 at 22 k05 -> exactly one odd group
    assert len(b.dropped) == 1


def test_validation(mixed_paths):
    with pytest.raises(ValueError, match="empty"):
        AudioBatcher([])
    with pytest.raises(ValueError, match="bad target_sr"):
        AudioBatcher(mixed_paths, batch_size=0)
    with pytest.raises(ValueError, match="on_error"):
        AudioBatcher(mixed_paths, on_error="ignore")


def test_extract_features_end_to_end(mixed_paths):
    from msv_tpu import log_mel_spectrogram

    rows, metas = extract_features(
        mixed_paths, lambda b: log_mel_spectrogram(b, 16000, n_mel=40),
        clip_seconds=0.5, batch_size=2,
    )
    assert len(rows) == len(metas) == len(mixed_paths)
    assert all(isinstance(m, ClipMeta) for m in metas)
    shapes = {r.shape for r in rows}
    assert len(shapes) == 1 and next(iter(shapes))[1] == 40
    # row/meta alignment: recompute one file directly
    i = [m.path for m in metas].index(mixed_paths[3])  # a 16 k file
    from msv_tpu.io.audio import open_audio_file

    wav2d, sr = open_audio_file(mixed_paths[3])
    x = wav2d.sum(axis=0)
    assert sr == 16000
    direct = np.asarray(log_mel_spectrogram(
        np.pad(x, (0, 8000 - len(x))), 16000, n_mel=40))
    np.testing.assert_allclose(rows[i], direct, atol=1e-6)
