"""Adaptive multi-resolution spectrogram tests (ops/multires.py — the
reference's unimplemented roadmap item, ReadMe.md:18)."""

import numpy as np
import pytest

from msv_tpu.config import SpecSetting
from msv_tpu.ops.multires import multires_mel_spec_db, _scale_params


def test_scale_params_share_hop():
    hop, wins = _scale_params(16000, SpecSetting(), (1, 2, 4))
    assert hop == 160
    assert [w for w, _ in wins] == [640, 320, 160]
    assert all(w % 2 == 0 for w, _ in wins)


def test_single_scale_is_plain_spectrogram(rng):
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    db1, n1 = multires_mel_spec_db(wav, 16000, scales=(1,), n_mel=64)
    db3, n3 = multires_mel_spec_db(wav, 16000, scales=(1, 1, 1), n_mel=64)
    assert n1 == n3
    # blending identical scales is the identity (convex combination)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db3), atol=1e-4)


def test_blend_is_convex_combination(rng):
    wav = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    db, n = multires_mel_spec_db(wav, 16000, scales=(1, 4), n_mel=64)
    db_long, _ = multires_mel_spec_db(wav, 16000, scales=(1,), n_mel=64)
    db_short, _ = multires_mel_spec_db(wav, 16000, scales=(4,), n_mel=64)
    lo = np.minimum(np.asarray(db_long), np.asarray(db_short))[:n]
    hi = np.maximum(np.asarray(db_long), np.asarray(db_short))[:n]
    got = np.asarray(db)[:n]
    assert (got >= lo - 1e-3).all() and (got <= hi + 1e-3).all()


def test_transient_sharper_than_long_window():
    """A click smears over ~win frames at coarse resolution; the adaptive
    blend should localize it better than the long window alone."""
    sr = 16000
    wav = np.zeros(sr // 2, np.float32)
    wav[4000] = 1.0
    db_a, n = multires_mel_spec_db(wav, sr, scales=(1, 4), n_mel=64)
    db_l, _ = multires_mel_spec_db(wav, sr, scales=(1,), n_mel=64)

    def spread(db):
        e = np.asarray(db)[:n].mean(axis=1)
        e = e - e.min()
        # frames above half-max around the click
        return (e > 0.5 * e.max()).sum()

    assert spread(db_a) <= spread(db_l)


def test_shapes_and_finiteness(rng):
    wav = (rng.standard_normal(12345) * 0.3).astype(np.float32)
    db, n = multires_mel_spec_db(wav, 8000, scales=(1, 2, 4), n_mel=96)
    assert db.shape == (n, 96)
    assert np.isfinite(np.asarray(db)).all()
