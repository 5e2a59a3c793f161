"""Profiling helpers: jax.profiler traces and simple wall-clock timers.

TPU-native replacement for the reference's (unused) Triton trace_setting RPC
(client.rs:190-195) and its println-based timing: wrap any region in
`trace(...)` to capture a TensorBoard-loadable device trace, or use `Timer`
for quick host-side spans that land in the stats registry.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str = ".rsfd_profile") -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard format) for the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named wall-clock spans (host-side)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }
