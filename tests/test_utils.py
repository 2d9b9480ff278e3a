"""Utility-layer tests (rounding parity, timers, caches)."""

import numpy as np
import pytest

from msv_tpu.utils import next_pow2, round_up_to
from msv_tpu.utils.profiling import StageTimer
from msv_tpu.utils.rounding import rust_round, rust_round_np, trunc_int


def test_next_pow2():
    assert [next_pow2(n) for n in (1, 2, 3, 320, 884, 1920, 2048)] == [
        1, 2, 4, 512, 1024, 2048, 2048,
    ]


def test_round_up_to():
    assert round_up_to(0, 8) == 0
    assert round_up_to(1, 8) == 8
    assert round_up_to(16, 8) == 16


def test_rust_round_half_away():
    xs = np.array([-2.5, -1.5, -0.5, 0.5, 1.5, 2.5, 220.5], np.float32)
    expect = np.array([-3, -2, -1, 1, 2, 3, 221], np.float32)
    np.testing.assert_array_equal(rust_round_np(xs), expect)
    import jax.numpy as jnp

    np.testing.assert_array_equal(np.asarray(rust_round(jnp.asarray(xs))), expect)


def test_trunc_int():
    assert trunc_int(3.9) == 3
    assert trunc_int(-0.5) == 0  # unsigned cast clamps
    assert trunc_int(0.0) == 0


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2 and s["a"]["total_s"] >= 0
    t.reset()
    assert t.summary() == {}


def test_jaxcache_no_crash(tmp_path):
    from msv_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache(str(tmp_path / "cache"))


def test_empty_session_checkpoint(tmp_path):
    from msv_tpu import MultiTrack

    mt = MultiTrack()
    p = str(tmp_path / "s.json")
    mt.save_session(p)
    mt2 = MultiTrack.load_session(p)
    assert not mt2.tracks
