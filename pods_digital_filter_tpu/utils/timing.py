"""Per-stage wall-time metrics (replaces the reference's commented-out
``time.time()`` deltas, digitalfilters.py:1421-1431) and jax.profiler hooks."""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class StageTimer:
    def __init__(self):
        self.times = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return "\n".join(f"{k:<30s} {v:10.4f} s" for k, v in self.times.items())


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """jax.profiler trace context when a directory is given."""
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
