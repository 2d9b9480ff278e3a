"""Multi-host deployment scaffolding (SURVEY.md §5.h: "DCN only for
multi-host file distribution").

On a multi-host slice the compute story is unchanged — the (dp, sp) mesh
simply spans all hosts' devices and XLA routes the halo `ppermute` and the
dB `pmax`/`pmin` over ICI.  The only DCN-bound work is getting FILES to
hosts: each process decodes its own subset (audio bytes never cross hosts;
only the sharded device arrays participate in collectives).

Single-host behavior is the identity, so every helper here is exercised by
the normal test suite; the jax.distributed wiring itself needs real
multi-host hardware (not available in this environment — see
docs/STATUS.md).
"""

import jax

from .mesh import make_mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize jax.distributed for a multi-host run (no-op if single).

    Call once per process before any jax computation, mirroring
    jax.distributed.initialize's contract.  With no arguments, environment
    auto-detection is used (TPU pods populate it).
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def assign_tracks_by_host(paths, process_index=None, process_count=None):
    """Deterministic round-robin file scatter: which of ``paths`` this host
    decodes.  Every host computes the same assignment (no coordination
    needed — the list order IS the contract)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [p for i, p in enumerate(paths) if i % pc == pi]


def make_global_mesh(n_dp: int = 1, n_sp: int | None = None):
    """A (dp, sp) mesh over ALL processes' devices (jax.devices() is global
    after initialize_distributed)."""
    return make_mesh(n_dp, n_sp, devices=jax.devices())
