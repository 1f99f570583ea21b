"""Per-phase timing counters + jax profiler hooks.

The reference has only log/env_logger + ad-hoc println timers (SURVEY.md §5
tracing); here every phase can be timed into a process-wide registry that
the server exposes at GET /metrics, and a real device trace can be captured
with the jax profiler for offline analysis in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class _Counter:
    __slots__ = ("count", "total_s", "max_s")

    def __init__(self):
        self.count = 0
        self.total_s = 0.0
        self.max_s = 0.0


class Profiler:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, _Counter] = defaultdict(_Counter)

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                c = self._counters[name]
                c.count += 1
                c.total_s += dt
                c.max_s = max(c.max_s, dt)

    def record(self, name: str, seconds: float):
        with self._lock:
            c = self._counters[name]
            c.count += 1
            c.total_s += seconds
            c.max_s = max(c.max_s, seconds)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                name: {
                    "count": c.count,
                    "total_s": round(c.total_s, 6),
                    "mean_s": round(c.total_s / c.count, 6) if c.count else 0.0,
                    "max_s": round(c.max_s, 6),
                }
                for name, c in sorted(self._counters.items())
            }

    def reset(self):
        with self._lock:
            self._counters.clear()


#: process-wide registry
profiler = Profiler()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax device profile (viewable in XProf/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
