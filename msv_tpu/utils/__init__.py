"""Small host-side utilities shared across the framework.

TPU-native re-implementation of the reference's ``src_rust/utils.rs``:
``calc_proper_n_fft`` (utils.rs:17-19) becomes :func:`next_pow2`;
``par_collect_to_hashmap`` (utils.rs:89-108) has no analogue because host
orchestration is a plain dict + one batched device launch.
"""

from .rounding import rust_round, rust_round_np, trunc_int
from .errors import MsvError, AudioReadError, TrackNotFoundError
from .profiling import StageTimer, get_logger

__all__ = [
    "next_pow2",
    "round_up_to",
    "rust_round",
    "rust_round_np",
    "trunc_int",
    "MsvError",
    "AudioReadError",
    "TrackNotFoundError",
    "StageTimer",
    "get_logger",
]


def next_pow2(n: int) -> int:
    """Smallest power of two >= n  (reference: ``calc_proper_n_fft``, utils.rs:17-19).

    The reference computes ``2^ceil(log2(n))`` in f32; for n >= 1 that is the
    next power of two, which we compute exactly with bit tricks.
    """
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def round_up_to(x: int, m: int) -> int:
    """Round ``x`` up to the next multiple of ``m`` (shape-bucketing helper)."""
    return -(-x // m) * m
