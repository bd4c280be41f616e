"""Profiling / tracing helpers.

The reference's observability is ad-hoc wall-clock deltas (rnn_trainer.py:517,
brain_speech_decoder.cc Timer/VLOG). Here: a stage timer that aggregates into
a stats dict, plus a thin wrapper over the JAX profiler for device traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates per-stage wall-clock totals/counts."""

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
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def log(self, logger) -> None:
        for name, s in sorted(self.summary().items()):
            logger.info(
                f"[timing] {name}: {s['total_s']:.3f}s total, "
                f"{s['mean_ms']:.2f}ms avg over {int(s['count'])}"
            )


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX device profile (XLA ops, HBM traffic) to log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
