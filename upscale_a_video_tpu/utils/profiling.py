"""Tracing/profiling helpers (SURVEY §5.1 rebuild).

The reference's only instrumentation is wall-clock prints with cuda.synchronize
(inference_upscale_a_video.py:205-206,337-338). Here:

- ``annotate(name)``: xprof-visible trace annotation (jax.profiler.TraceAnnotation)
- ``StageTimer``: per-stage wall-clock accounting with device sync, printed as
  a structured summary
- ``trace(dir)``: capture a full xprof trace around a block
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Iterator

import jax


def annotate(name: str):
    """Trace annotation visible in xprof/tensorboard profiles."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates per-stage wall-clock with device synchronization."""

    def __init__(self):
        self.stages: "OrderedDict[str, float]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        (jax.device_put(0.0) + 0).block_until_ready()  # drain queue
        t0 = time.perf_counter()
        with annotate(name):
            yield
        (jax.device_put(0.0) + 0).block_until_ready()
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.stages.values())
        lines = [f"{'stage':<24}{'sec':>10}{'%':>8}"]
        for name, sec in self.stages.items():
            pct = 100.0 * sec / total if total else 0.0
            lines.append(f"{name:<24}{sec:>10.3f}{pct:>7.1f}%")
        lines.append(f"{'total':<24}{total:>10.3f}")
        return "\n".join(lines)
