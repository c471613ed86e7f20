"""Tracing and profiling hooks (absent in the reference, which logs via
std::cout and discards RAMA's timeline — SURVEY.md section 5).

Wraps jax.profiler for device traces plus a lightweight phase timer for
host-side structured logs.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; emits one JSON line."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {name: {"total_s": round(total, 4),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * total / self.counts[name], 3)}
                for name, total in self.totals.items()}

    def log(self, out=print):
        out(json.dumps({"phase_timings": self.summary()}))


def annotate(name: str):
    """Named XLA trace annotation (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)
