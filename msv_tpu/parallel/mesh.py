"""Mesh helpers: a (dp, sp) device mesh over ICI.

dp ("data parallel") shards independent tracks/files; sp ("sequence
parallel") shards the time axis of one waveform.  On a physical TPU slice
both axes ride ICI; tests use the 8-device virtual CPU mesh.
"""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_dp: int = 1, n_sp: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_sp is None:
        n_sp = len(devices) // n_dp
    if n_dp * n_sp > len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_sp} needs {n_dp * n_sp} devices, "
            f"have {len(devices)}"
        )
    devs = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(devs, axis_names=("dp", "sp"))
