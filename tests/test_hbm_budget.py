"""Session HBM budget + LRU spill (round-5 VERDICT #7).

Device-resident dB planes are ~90 MB per hour-track and the reference
keeps everything resident forever (lib.rs:80); the budget bounds the
session's device footprint by spilling the least-recently-rendered
track's plane to host (bit-exact f32) and dropping rebuildable buffers.
Pinned here: a 20-track session under a budget sized for ~3 planes stays
bounded through a full render sweep, spilled tracks re-render
pixel-identically (vs an unbounded twin session), and the accounting
surfaces via hbm_stats().
"""

import numpy as np
import pytest

from msv_tpu.io.audio import write_wav
from msv_tpu.session import MultiTrack


N_TRACKS = 20


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    td = tmp_path_factory.mktemp("hbm")
    rng = np.random.default_rng(7)
    sr = 8000
    paths = []
    for i in range(N_TRACKS):
        t = np.arange(int(sr * 0.5)) / sr
        x = (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        p = str(td / f"t{i}.wav")
        write_wav(p, x[None], sr)
        paths.append(p)
    return paths


def test_budget_bounds_resident_and_renders_identical(wavs):
    ids = list(range(N_TRACKS))
    ref = MultiTrack()
    ref.add_tracks(ids, wavs)

    # size the budget from one fully-rendered track's footprint (the
    # envelope dev buffer is bucket-padded, so it dominates tiny tracks)
    probe = MultiTrack()
    probe.add_tracks([0], [wavs[0]])
    probe.get_spec_image(0, 100.0, 120)
    probe.get_wav_image(0, 100.0, 60, -1.0, 1.0)
    per = max(probe.hbm_stats()["per_track_bytes"].values())
    budget = 3 * per + per // 2

    mt = MultiTrack(hbm_budget_bytes=budget)
    mt.add_tracks(ids, wavs)
    stats = mt.hbm_stats()
    assert stats["budget_bytes"] == budget
    assert stats["resident_bytes"] <= budget
    assert stats["spills"] > 0  # 20 planes can't fit in ~3

    # the global dB window must match (it derives from host-side scalars,
    # not from residency)
    assert (mt.max_db, mt.min_db) == (ref.max_db, ref.min_db)

    # full sweep: every track renders despite most planes being spilled,
    # pixel-identical to the unbounded session, and the total stays
    # bounded after every render
    for i in ids:
        a = mt.get_spec_image(i, 100.0, 120)
        b = ref.get_spec_image(i, 100.0, 120)
        np.testing.assert_array_equal(a, b)
        w_a = mt.get_wav_image(i, 100.0, 60, -1.0, 1.0)
        w_b = ref.get_wav_image(i, 100.0, 60, -1.0, 1.0)
        np.testing.assert_array_equal(w_a, w_b)
        assert mt.hbm_stats()["resident_bytes"] <= budget
    assert mt.hbm_stats()["reuploads"] > 0

    # revisiting the coldest track after the sweep still matches
    np.testing.assert_array_equal(
        mt.get_spec_image(0, 80.0, 90), ref.get_spec_image(0, 80.0, 90))


def test_unbounded_session_never_spills(wavs):
    mt = MultiTrack()
    mt.add_tracks([0, 1], wavs[:2])
    mt.get_spec_image(0, 50.0, 64)
    s = mt.hbm_stats()
    assert s["budget_bytes"] is None
    assert s["spills"] == 0 and s["reuploads"] == 0
    assert s["resident_bytes"] > 0


def test_config_default_budget(wavs):
    from msv_tpu.config import set_session_hbm_budget

    set_session_hbm_budget(123456789)
    try:
        mt = MultiTrack()
        assert mt.hbm_budget_bytes == 123456789
        # per-session override wins
        mt2 = MultiTrack(hbm_budget_bytes=42)
        assert mt2.hbm_budget_bytes == 42
        with pytest.raises(ValueError):
            set_session_hbm_budget(-1)
    finally:
        set_session_hbm_budget(None)


def test_remove_track_clears_lru(wavs):
    mt = MultiTrack(hbm_budget_bytes=1)  # everything spills
    mt.add_tracks([0, 1], wavs[:2])
    mt.get_spec_image(1, 50.0, 64)
    assert mt.remove_track(1) is not None
    assert 1 not in mt._lru
    # remaining track still renders
    assert mt.get_spec_image(0, 50.0, 64).shape[0] == 64
