"""Tracing/profiling helpers.

Replaces the reference's ad-hoc wall-clock timing (SURVEY.md 5.1;
video_model.py:433-453, video_coder.py timing logs) with jax.profiler traces
for device work plus named host-side timers for the rANS stages.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class HostTimers:
    """Named accumulating host timers (encode/decode/rANS stages)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def track(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, logger: logging.Logger | None = None) -> dict:
        out = {name: {"total_s": self.totals[name],
                      "count": self.counts[name],
                      "mean_ms": self.totals[name] / max(self.counts[name], 1)
                      * 1000}
               for name in self.totals}
        if logger is not None:
            for name, stats in sorted(out.items()):
                logger.info("%s: %.2f ms avg over %d calls",
                            name, stats["mean_ms"], stats["count"])
        return out
