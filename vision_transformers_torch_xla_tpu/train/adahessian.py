"""AdaHessian: an adaptive second-order optimizer (Yao et al., arXiv:2006.00719).

Surface parity: the reference dispatches ``opt_lower == 'adahessian'`` to
``timm.optim.adahessian.Adahessian`` (reference optim_factory.py:264-265) and
its engine threads ``create_graph=is_second_order`` into the backward so the
optimizer can take a Hessian-vector product (reference engine.py:247-250).

The torch version needs a retained autograd graph and a second ``.grad()``
call. The JAX formulation is a forward-over-reverse ``jax.jvp`` of the
gradient function — one extra fused fwd+bwd pass, no graph retention, and it
jits into the same XLA program as the step (the duplicated primal forward is
CSE'd by XLA):

    D = z * jvp(grad(loss))(params; z),   z ~ Rademacher

which is the Hutchinson estimator of the Hessian diagonal (exact in
expectation; exact pointwise for diagonal Hessians since z*z = 1).

Update rule (Adam with D^2 replacing g^2 in the second moment):

    m_t = b1 m + (1-b1) g            v_t = b2 v + (1-b2) D_avg^2
    p  -= lr * ( m_hat / ((v_hat)^(k/2) + eps) + wd * p )

with optional spatial averaging of D for conv kernels (``avg_conv_kernel``;
Flax HWIO layout -> mean over axes (0, 1)) and the ``hessian_power`` k knob.
Weight decay is decoupled (not scaled by the preconditioner), matching the
torch implementation's ``wd * p`` term inside the lr-scaled update.

Because the estimator needs the loss function (not just grads), the
transformation is an ``optax.GradientTransformationExtraArgs`` taking
``hessian_diag=...``; ``hutchinson_diag`` computes that cotangent in the
train step (train/steps.py wires it when the recipe is second-order, the
moral twin of reference engine.py:247's ``is_second_order`` probe).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]


def rademacher_like(rng: jax.Array, params: Any) -> Any:
    """A tree of iid +-1 draws, one independent stream per leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    zs = [jax.random.rademacher(k, l.shape, jnp.float32).astype(l.dtype)
          for k, l in zip(keys, leaves)]
    return jax.tree_util.tree_unflatten(treedef, zs)


def hutchinson_diag(grad_fn: Callable, params: Any, rng: jax.Array,
                    avg_conv_kernel: bool = True) -> Any:
    """One-sample Hutchinson estimate of the Hessian diagonal.

    ``grad_fn(params) -> grads`` must be differentiable (a ``jax.grad`` of
    the loss). Returns ``z * H z`` per leaf; conv kernels (ndim == 4, HWIO)
    are spatially averaged when ``avg_conv_kernel`` — the block-diagonal
    smoothing the paper recommends for convolutions (arXiv:2006.00719 §3.2).
    """
    z = rademacher_like(rng, params)
    _, hvp = jax.jvp(grad_fn, (params,), (z,))
    diag = jax.tree.map(lambda zi, hi: zi * hi, z, hvp)
    if avg_conv_kernel:
        diag = jax.tree.map(
            lambda d: jnp.broadcast_to(
                d.mean(axis=(0, 1), keepdims=True), d.shape)
            if d.ndim == 4 else d,
            diag)
    return diag


class ScaleByAdahessianState(NamedTuple):
    count: jax.Array
    mu: Any       # first moment of grads
    nu: Any       # second moment of the Hessian-diagonal estimate


def scale_by_adahessian(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8,
                        hessian_power: float = 1.0
                        ) -> optax.GradientTransformationExtraArgs:
    """Adam-style preconditioning with D^2 as the second moment.

    ``update`` requires ``hessian_diag=<tree like params>`` as an extra arg
    (optax.chain forwards extra kwargs to members that accept them).
    """

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdahessianState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update(updates, state, params=None, **extra):
        del params
        hd = extra["hessian_diag"]
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, d: b2 * v + (1 - b2) * (d * d),
                          state.nu, hd)
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        k = hessian_power

        def precondition(m, v):
            denom = (v / bc2) ** (k / 2) + eps
            return (m / bc1) / denom

        return (jax.tree.map(precondition, mu, nu),
                ScaleByAdahessianState(count, mu, nu))

    return optax.GradientTransformationExtraArgs(init, update)


def adahessian(learning_rate: ScalarOrSchedule, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 0.0, hessian_power: float = 1.0,
               mask: Optional[Any] = None
               ) -> optax.GradientTransformationExtraArgs:
    """Full AdaHessian update chain (decoupled weight decay, lr-scaled).

    ``weight_decay`` is always chained (0.0 is a no-op) so it stays a
    traceable hyperparameter under ``optax.inject_hyperparams``.
    """
    return optax.chain(
        scale_by_adahessian(b1, b2, eps, hessian_power),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )
