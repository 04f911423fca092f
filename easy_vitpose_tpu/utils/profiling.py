"""Profiling / tracing hooks.

The reference has no profiling beyond wall-clock FPS prints
(reference inference.py:100-134; README admits bottleneck analysis is TODO).
Here: jax.profiler trace capture as a context manager, plus a lightweight
per-stage wall-clock aggregator for the serving pipeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a code block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates host wall-clock per named pipeline stage."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "calls": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        lines = [f"  {k:20s} {v['mean_ms']:8.2f} ms x {v['calls']}"
                 for k, v in sorted(self.summary().items())]
        return "\n".join(lines)
