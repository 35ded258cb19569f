"""RNG discipline.

The reference seeds per-rank with `seed + rank` (reference main.py:405-407)
and then relies on framework-global RNG state. JAX replaces that with
explicit key threading: one root key, folded with the step counter and named
streams. Under a sharded `jit` the same key yields per-device-consistent
randomness, so mixup/droppath/shuffle decisions are reproducible regardless
of mesh shape.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax


def make_rngs(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    """Split a root key into named streams (e.g. dropout / droppath / mixup)."""
    keys = jax.random.split(key, len(names))
    return {name: k for name, k in zip(names, keys)}


def fold_in_step(key: jax.Array, step) -> jax.Array:
    """Derive a per-step key; safe to call inside jit (step may be traced)."""
    return jax.random.fold_in(key, step)
