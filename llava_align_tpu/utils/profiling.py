"""Tracing / profiling helpers.

The reference has no profiling subsystem (SURVEY §5: tqdm only). TPU build:
jax.profiler traces plus lightweight per-phase wall timers that are safe
around async dispatch (block_until_ready on enter/exit).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; device-synchronized."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True) -> Iterator[None]:
        if sync:
            jax.block_until_ready(jax.numpy.zeros(()))
        t0 = time.perf_counter()
        yield
        if sync:
            jax.block_until_ready(jax.numpy.zeros(()))
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (viewable in TensorBoard/xprof). No-op when
    log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
