"""Persistent XLA compilation cache.

First compiles through the axon remote-compile path cost 40-350 s per shape
bucket; enabling jax's persistent cache makes every subsequent process
reuse them.  Called by the CLI and bench entrypoints (not by library import,
to keep imports side-effect free).
"""

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "msv_tpu_xla_cache"
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags — cache is an optimization only
