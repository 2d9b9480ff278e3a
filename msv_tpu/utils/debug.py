"""Dev-mode numerical debugging (SURVEY.md §5.b).

The reference relies on Rust's type system plus two audited ``unsafe``
blocks; the JAX equivalent of a sanitizer pass is the runtime NaN checker
and, for device-side inspection, ``jax.debug``.
"""

from contextlib import contextmanager


def enable_nan_checks(on: bool = True) -> None:
    """Turn on jax's NaN debugging (every jit output checked; errors point
    at the producing op).  Dev mode only — disables some fusion."""
    import jax

    jax.config.update("jax_debug_nans", on)


@contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of everything inside the block.

    View with TensorBoard or Perfetto.  The cheap always-on layer is
    utils.profiling.StageTimer; this is the deep device-level view
    (SURVEY.md §5.a).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
