"""Host-side metric meters.

API parity with the reference's `SmoothedValue` / `MetricLogger`
(reference utils/__init__.py:103-275): windowed median/avg plus global
averages, cross-process synchronization, and a `log_every` iterator wrapper
with ETA. The TPU-native difference: meters are fed from device scalars
pulled only at log_freq cadence (the per-step `.item()` pulls at reference
engine.py:218-224 are the documented step-time hazard), and cross-process
reduction uses `jax.experimental.multihost_utils` instead of
torch.distributed all_reduce.
"""
from __future__ import annotations

import collections
import datetime
import time
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    """Track a series: window-smoothed stats + global average."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """All-reduce [count, total] across hosts (reference :122-143)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], np.float64)
        summed = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Dict of SmoothedValues + iterator wrapper printing progress/ETA."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: Optional[int] = None):
        i = 0
        start = time.time()
        last = start
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        if total is None:
            total = len(iterable) if hasattr(iterable, "__len__") else None
        t_prev = time.time()
        for obj in iterable:
            data_time.update(time.time() - t_prev)
            yield obj
            iter_time.update(time.time() - t_prev)
            t_prev = time.time()
            if i % print_freq == 0 or (total and i == total - 1):
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    self.print_fn(
                        f"{header} [{i}/{total}] eta: {eta_str} {self} "
                        f"time: {iter_time} data: {data_time}")
                else:
                    self.print_fn(f"{header} [{i}] {self} time: {iter_time}")
            i += 1
            if total and i >= total:
                break
        elapsed = time.time() - start
        self.print_fn(f"{header} done in {datetime.timedelta(seconds=int(elapsed))} "
                      f"({elapsed / max(i, 1):.4f} s/it)")
