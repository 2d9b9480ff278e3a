"""Decibel op tests (reference: decibel.rs semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from msv_tpu.ops.decibel import (
    AMIN_AMP_DEFAULT,
    amp_to_db,
    db_to_amp,
    db_to_power,
    power_to_db,
)


def test_amp_to_db_basic():
    x = jnp.asarray([1.0, 10.0, 0.1])
    np.testing.assert_allclose(amp_to_db(x), [0.0, 20.0, -20.0], atol=1e-3)


def test_power_to_db_basic():
    x = jnp.asarray([1.0, 10.0, 0.1])
    np.testing.assert_allclose(power_to_db(x), [0.0, 10.0, -10.0], atol=1e-3)


def test_amp_to_db_floor_semantics():
    # decibel.rs:49-55: x > amin ? log10(x)-log_ref : log10(amin)-log_ref
    # with defaults ref=1, amin=1e-18 => floor at -360 dB, strict >.
    x = jnp.asarray([0.0, AMIN_AMP_DEFAULT, AMIN_AMP_DEFAULT * 1.0001])
    out = np.asarray(amp_to_db(x))
    assert out[0] == pytest.approx(-360.0, abs=1e-3)
    assert out[1] == pytest.approx(-360.0, abs=1e-3)  # == amin floors too
    assert out[2] > -360.0


def test_ref_below_amin():
    # log_ref falls back to log10(amin) when ref <= amin (decibel.rs:44-48)
    x = jnp.asarray([1.0])
    out = np.asarray(amp_to_db(x, ref_value=0.0))
    # log_ref = log10(amin) = -18 => 20*(0 - (-18)) = 360
    assert out[0] == pytest.approx(360.0, abs=1e-3)


def test_db_amp_roundtrip():
    x = jnp.asarray([0.5, 1.0, 2.0, 1e-6])
    np.testing.assert_allclose(
        np.asarray(db_to_amp(amp_to_db(x))), np.asarray(x), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(db_to_power(power_to_db(x))), np.asarray(x), rtol=1e-4
    )


def test_validation():
    with pytest.raises(ValueError):
        amp_to_db(jnp.asarray([1.0]), ref_value=-1.0)


def test_max_reference_mode():
    """DeciBelRef::Max (decibel.rs:11-13,41): 0 dB at the array max."""
    x = jnp.asarray([0.5, 1.0, 2.0])
    out = np.asarray(amp_to_db(x, ref_value="max"))
    assert out[2] == pytest.approx(0.0, abs=1e-3)
    assert out[1] == pytest.approx(-20.0 * np.log10(2.0), abs=1e-3)
    # ref <= amin fallback: all-below-floor array
    tiny = jnp.asarray([0.0, 0.0])
    out2 = np.asarray(amp_to_db(tiny, ref_value="max"))
    assert out2[0] == pytest.approx(0.0, abs=1e-3)  # log_amin - log_amin


def test_a_weighting_iec_anchors():
    """IEC 61672-1 table anchors (formula-exact to the rounded table
    within 0.2 dB) + shape/floor behavior."""
    from msv_tpu.ops.decibel import a_weighting

    freqs = [31.5, 100.0, 1000.0, 8000.0, 10000.0]
    want = [-39.4, -19.1, 0.0, -1.1, -2.5]
    got = a_weighting(freqs)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=0.2)
    # monotone rolloff below 1 kHz; floored at min_db incl. f=0
    lo = a_weighting(np.linspace(0.0, 1000.0, 101), min_db=-80.0)
    assert lo[0] == -80.0 and (np.diff(lo) >= 0).all()
    unfloored = a_weighting([1.0], min_db=None)
    assert unfloored[0] < -100.0
