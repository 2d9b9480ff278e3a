"""Structured stage timing + logging (SURVEY.md §5.a / §5.e).

The reference has no tracing at all; its closest artifact is the criterion
wall-clock bench harness (benches/bench.rs).  Here every pipeline stage can be
timed, and the session logs cache hits/misses on the window/mel/grey caches.

For deep profiles use ``jax.profiler.trace`` around a session call; these
timers are the cheap always-on layer.
"""

import logging
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_logger = None


def get_logger() -> logging.Logger:
    global _logger
    if _logger is None:
        _logger = logging.getLogger("msv_tpu")
        if not _logger.handlers:
            h = logging.StreamHandler()
            h.setFormatter(
                logging.Formatter("%(asctime)s msv_tpu %(levelname)s %(message)s")
            )
            _logger.addHandler(h)
        _logger.setLevel(logging.WARNING)
    return _logger


class StageTimer:
    """Accumulates wall-clock per named pipeline stage.

    >>> t = StageTimer()
    >>> with t.stage("stft"):
    ...     do_work()
    >>> t.summary()   # {'stft': {'calls': 1, 'total_s': ...}}
    """

    def __init__(self):
        self._acc = defaultdict(lambda: [0, 0.0])  # name -> [calls, seconds]
        # viewer renders run concurrently (reader side of the session RW
        # lock), so accumulation and the /api/stats snapshot both lock
        self._lock = threading.Lock()

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                a = self._acc[name]
                a[0] += 1
                a[1] += dt

    def summary(self):
        with self._lock:
            return {
                k: {"calls": c, "total_s": s} for k, (c, s) in self._acc.items()
            }

    def reset(self):
        with self._lock:
            self._acc.clear()
