"""Bias add whose backward reduces via an MXU dot instead of a VPU loop.

The gradient of a broadcast bias add is a full reduction of dy over every
leading axis. XLA lowers that as a loop-fusion reduce which, when fused
with neighbouring elementwise work (droppath masks, residual adds), runs
well below HBM streaming rate — measured 1.4 ms/step for the 12 attention
projections of ViT-B/128 on v5e vs a 0.57 ms read floor. Contracting
against a ones vector instead puts the reduction on the MXU, which streams
the operand at full HBM rate, and leaves the neighbouring elementwise
fusion without the reduce in its loop nest.

Forward numerics are identical to `y + b` (same broadcast add, same
dtypes); the backward accumulates in fp32 via preferred_element_type,
matching autodiff's reduce-in-fp32.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


@jax.custom_vjp
def bias_add(y: jax.Array, b: jax.Array) -> jax.Array:
    """y + b with b broadcast over y's leading axes; db computed as a dot."""
    return y + b.astype(y.dtype)


def _fwd(y, b):
    # residual is b itself (a few KB) — dtypes/shapes aren't valid residual
    # leaves, and dy already carries y's shape
    return y + b.astype(y.dtype), b


def _bwd(b, dy):
    n = math.prod(dy.shape[:-1])
    dy2 = dy.reshape(n, dy.shape[-1])
    ones = jnp.ones((1, n), dy.dtype)  # broadcast-folded by XLA, never in HBM
    db = jax.lax.dot_general(ones, dy2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[0]
    return dy, db.astype(b.dtype)


bias_add.defvjp(_fwd, _bwd)
