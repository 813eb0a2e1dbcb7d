"""Tracing and profiling hooks.

The reference has no profiler at all — only wall-clock prints
(extract_utils.py:139,148) and CUDA max-memory in MetricLogger (util.py:190-234).
SURVEY.md section 5 calls for jax.profiler trace hooks + per-stage
images/sec/chip counters; this module provides both:

  * `trace(logdir)` — context manager around `jax.profiler.trace`, producing
    TensorBoard-compatible XLA traces (op-level timeline, HBM usage).
  * `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper for host-side
    pipeline phases so stage boundaries show up in the timeline.
  * `StageTimer` — per-stage throughput accounting printed as one summary
    table; used by the pipeline driver.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture an XLA profiler trace into `logdir` (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(str(logdir)):
        yield


def annotate(name: str):
    """Named region in the profiler timeline for host-side phases."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StageStats:
    items: int = 0
    seconds: float = 0.0

    @property
    def throughput(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


@dataclass
class StageTimer:
    """Accumulates per-stage wall time and item counts.

    Usage:
        timer = StageTimer()
        with timer.stage("extract_features", n_items=batch):
            ...
        print(timer.summary())
    """
    stats: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, n_items: int = 0):
        s = self.stats.setdefault(name, StageStats())
        t0 = time.perf_counter()
        with annotate(name):
            yield
        s.seconds += time.perf_counter() - t0
        s.items += n_items

    def summary(self) -> str:
        n_chips = max(jax.local_device_count(), 1)
        lines = [f"{'stage':<36} {'items':>8} {'sec':>9} {'items/s':>10} "
                 f"{'items/s/chip':>13}"]
        for name, s in self.stats.items():
            lines.append(f"{name:<36} {s.items:>8} {s.seconds:>9.2f} "
                         f"{s.throughput:>10.2f} {s.throughput / n_chips:>13.2f}")
        return "\n".join(lines)
