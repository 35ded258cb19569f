"""LR / weight-decay schedules.

Semantics parity with the reference's `cosine_scheduler`
(reference utils/__init__.py:667-684): linear warmup from
`start_warmup_value` to `base_value` over `warmup_iters` steps, then a
half-cosine decay from `base_value` to `final_value` over the remaining
iterations. The reference materializes a numpy array indexed by global
iteration (asserting len == epochs*steps_per_epoch); here the canonical form
is a step->value function usable inside jit, with `.as_array` provided for
parity testing and logging.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np


def cosine_schedule_fn(base_value: float, final_value: float, epochs: int,
                       niter_per_ep: int, warmup_epochs: int = 0,
                       start_warmup_value: float = 0.0,
                       warmup_steps: int = -1) -> Callable:
    """Return f(step) -> value, traceable under jit.

    Matches utils/__init__.py:667-684 exactly:
      warmup_iters = warmup_steps if warmup_steps > 0 else warmup_epochs * niter_per_ep
      warmup:   start + i * (base - start) / warmup_iters        (i in [0, warmup))
      cosine:   final + 0.5*(base-final)*(1+cos(pi * j / rest))  (j = i - warmup)
    """
    warmup_iters = warmup_steps if warmup_steps > 0 else int(warmup_epochs * niter_per_ep)
    total = epochs * niter_per_ep
    rest = max(total - warmup_iters, 1)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_value + step * (base_value - start_warmup_value) / max(warmup_iters, 1)
        j = jnp.minimum(step - warmup_iters, rest)
        cos = final_value + 0.5 * (base_value - final_value) * (1 + jnp.cos(jnp.pi * j / rest))
        return jnp.where(step < warmup_iters, warm, cos)

    return fn


def cosine_scheduler(base_value: float, final_value: float, epochs: int,
                     niter_per_ep: int, warmup_epochs: int = 0,
                     start_warmup_value: float = 0.0,
                     warmup_steps: int = -1) -> np.ndarray:
    """Materialized array form (parity with the reference's return type)."""
    warmup_iters = warmup_steps if warmup_steps > 0 else int(warmup_epochs * niter_per_ep)
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters, endpoint=False) \
        if warmup_iters > 0 else np.array([])
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    rest = max(len(iters), 1)
    cosine = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / rest))
    schedule = np.concatenate((warmup, cosine))
    assert len(schedule) == epochs * niter_per_ep
    return schedule
