"""Multi-chip scaling (SURVEY.md §2 parallelism inventory, §5.g/h).

The reference's only concurrency is rayon shared-memory threads; its three
granularities map to TPU as:

  rayon across tracks      -> batch data parallelism over a mesh "dp" axis
  rayon across STFT frames -> sequence sharding over a mesh "sp" axis with a
                              (win - hop)-sample halo exchange (ppermute over
                              ICI) — the STFT analogue of context parallelism
  rayon across mel columns -> just the mel GEMM on the MXU

and the one true all-reduce in the program (the global dB min/max,
lib.rs:194-207) becomes jax.lax.pmax/pmin over both axes.

``streaming`` handles the long-file case on a single chip: lax.scan over
HBM-resident overlapped chunks so hour-scale files never materialize the
full frame tensor.
"""

from .mesh import make_mesh
from .sharded import (sharded_envelope_minmax, sharded_spec_pipeline,
                      sharded_streaming_spec_db)
from .streaming import streaming_spec_db

__all__ = [
    "make_mesh",
    "sharded_envelope_minmax",
    "sharded_spec_pipeline",
    "sharded_streaming_spec_db",
    "streaming_spec_db",
]
