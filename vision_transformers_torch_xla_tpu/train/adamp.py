"""AdamP / SGDP optimizers as optax transforms.

Parity with the reference's optimizer surface (reference
optim_factory.py:214-296 dispatches 'adamp' and 'sgdp' to timm.optim).
AdamP/SGDP (Heo et al., 2021) suppress the norm-growth of scale-invariant
weights (those followed by a normalization layer) by projecting the update
onto the tangent space of the weight's sphere whenever weight and update are
nearly orthogonal-scale-aligned.

Projection view: per output channel for matrices/convs (rows of the
(out, -1) reshape in torch layout; here the LAST axis is the output for
Dense kernels, so we reshape to (-1, out) and project per column-equivalent
by transposing the math), whole-tensor for 1-D params (which are masked out
of projection anyway, matching timm behavior for biases/norm scales).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def _channel_project(p: jax.Array, update: jax.Array, delta: float,
                     eps: float = 1e-8):
    """Project update off p where cosine-similarity is below delta/sqrt(dim).

    Returns (new_update, wd_gate) where wd_gate in {0., 1.}: 0 when projected
    (weight decay is then scaled by wd_ratio, per the AdamP paper).
    """
    if p.ndim < 2:
        return update, jnp.ones(())
    # view: (features..., out) -> (out, rest): channel = output unit
    pm = jnp.moveaxis(p, -1, 0).reshape(p.shape[-1], -1)
    um = jnp.moveaxis(update, -1, 0).reshape(p.shape[-1], -1)
    pn = pm / (jnp.linalg.norm(pm, axis=1, keepdims=True) + eps)
    cos = jnp.abs((pn * um).sum(1)) / (jnp.linalg.norm(um, axis=1) + eps)
    dim = pm.shape[1]
    project = (cos.max() < delta / jnp.sqrt(dim)).astype(p.dtype)
    um_proj = um - (pn * um).sum(1, keepdims=True) * pn
    out = um * (1 - project) + um_proj * project
    out = jnp.moveaxis(out.reshape((p.shape[-1],) + p.shape[:-1]), 0, -1)
    return out, 1.0 - project


class AdamPState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def adamp(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, mask: Optional[Any] = None,
          nesterov: bool = False) -> optax.GradientTransformation:
    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamPState(jnp.zeros((), jnp.int32), z(), z())

    def update(grads, state, params):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda n, g: b2 * n + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def leaf_update(p, m, n, g):
            m_hat = (b1 * m + (1 - b1) * g) / bc1 if nesterov else m / bc1
            step = m_hat / (jnp.sqrt(n / bc2) + eps)
            step, wd_gate = _channel_project(p, step, delta)
            wd_scale = wd_gate + (1 - wd_gate) * wd_ratio
            return step, wd_scale

        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        mask_tree = mask if mask is not None else jax.tree.map(lambda _: True, params)

        def final(p, m, n, g, use_wd):
            step, wd_scale = leaf_update(p, m, n, g)
            wd = weight_decay * wd_scale if use_wd else 0.0
            return -lr * (step + wd * p)

        updates = jax.tree.map(final, params, mu, nu, grads, mask_tree)
        return updates, AdamPState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    count: jax.Array
    momentum: Any


def sgdp(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0,
         delta: float = 0.1, wd_ratio: float = 0.1, nesterov: bool = True,
         mask: Optional[Any] = None) -> optax.GradientTransformation:
    def init(params):
        return SGDPState(jnp.zeros((), jnp.int32),
                         jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        buf = jax.tree.map(lambda b, g: momentum * b + g, state.momentum, grads)
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        mask_tree = mask if mask is not None else jax.tree.map(lambda _: True, params)

        def final(p, b, g, use_wd):
            d = g + momentum * b if nesterov else b
            d, wd_gate = _channel_project(p, d, delta)
            wd_scale = wd_gate + (1 - wd_gate) * wd_ratio
            wd = weight_decay * wd_scale if use_wd else 0.0
            return -lr * (d + wd * p)

        updates = jax.tree.map(final, params, buf, grads, mask_tree)
        return updates, SGDPState(count, buf)

    return optax.GradientTransformation(init, update)
