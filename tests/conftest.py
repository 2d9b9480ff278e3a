"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count per the project instructions.  Must run
before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend regardless of env
# vars; this config update reliably pins tests to the 8-device virtual CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_SAMPLES = "/root/reference/samples"


@pytest.fixture(scope="session")
def reference_sample_paths():
    """Bundled reference WAVs (read-only), or skip if unavailable."""
    if not os.path.isdir(REFERENCE_SAMPLES):
        pytest.skip("reference samples not available")
    names = [
        "sample_8k.wav",
        "sample_16k.wav",
        "sample_22k05.wav",
        "sample_24k.wav",
        "sample_44k1.wav",
    ]
    paths = [os.path.join(REFERENCE_SAMPLES, n) for n in names]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("reference samples incomplete")
    return paths


@pytest.fixture()
def rng():
    # MSV_TEST_SEED lets extended fuzz sessions sweep FRESH seeds over
    # every randomized test (CI stays deterministic at the default)
    return np.random.default_rng(int(os.environ.get("MSV_TEST_SEED",
                                                    "20260816")))


@pytest.fixture(autouse=True)
def _isolate_config_globals():
    """Snapshot/restore the session config globals around every test so a
    test that flips precision (which latches the explicit flag features.py
    consults), engine, or a wire format — and then crashes before its own
    finally — cannot leak into later tests."""
    from msv_tpu import config as _cfg

    saved = (
        _cfg._PRECISION_MODE,
        _cfg._PRECISION_MODE_EXPLICIT,
        _cfg._ENGINE,
        _cfg._IMAGE_WIRE,
        _cfg._DB_WIRE,
    )
    yield
    (
        _cfg._PRECISION_MODE,
        _cfg._PRECISION_MODE_EXPLICIT,
        _cfg._ENGINE,
        _cfg._IMAGE_WIRE,
        _cfg._DB_WIRE,
    ) = saved
