"""Device compute pipelines.

``pipeline``: the fused pure-JAX/XLA spectrogram pipeline (always available;
the parity oracle).  ``spectrogram_pallas``: hand-fused Pallas TPU kernel for
the hot path (framing + windowed-DFT GEMM + magnitude + mel GEMM + dB in one
VMEM-resident pass), with the pure-JAX path as fallback.
"""

from .pipeline import spec_pipeline, render_rgb

__all__ = ["spec_pipeline", "render_rgb"]
