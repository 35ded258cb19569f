"""Profiling hooks.

The reference has no profiler integration — only manual wall-clock prints
(SURVEY §5 'Tracing/profiling'; reference engine.py:68-72, 211-235). Here
profiling is first-class: `jax.profiler` traces viewable in
TensorBoard/Perfetto plus named step/annotation context managers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device+host trace into log_dir (open with TensorBoard's
    profile plugin or ui.perfetto.dev)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: Optional[int] = None):
    """Annotate a training step so it shows as one unit in the trace."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def named_scope(name: str):
    """Annotate a host-side region."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Lightweight host-side step timing with percentiles (replaces the
    reference's ad-hoc iteration prints)."""

    def __init__(self):
        self.times = []
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self):
        if self._t is not None:
            self.times.append(time.perf_counter() - self._t)
            self._t = None

    def summary(self) -> dict:
        if not self.times:
            return {}
        import numpy as np

        a = np.asarray(self.times)
        return {"mean_s": float(a.mean()), "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)), "n": len(a)}
