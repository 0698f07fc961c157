"""Profiling/observability helpers (an addition over the reference, which
ships none — SURVEY.md §5): jax.profiler trace capture, per-phase wall-clock
timers with device synchronization, and rays/s throughput meters."""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture a TensorBoard-viewable XLA trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates per-phase wall time with block_until_ready barriers."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4),
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3),
                    "count": self.counts[k]}
                for k, v in self.totals.items()}

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


class ThroughputMeter:
    """rays/s (or any unit/s) over a timed window with device sync."""

    def __init__(self):
        self.units = 0
        self.t0 = None

    def start(self):
        self.t0 = time.perf_counter()
        self.units = 0

    def add(self, n: int):
        self.units += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self.t0
        return self.units / max(dt, 1e-9)
