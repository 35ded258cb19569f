"""Train state: one PyTree holding everything the step updates.

Replaces the reference's scattered mutable objects (model params, optimizer
state, `ModelEma` forced onto CPU at reference main.py:402/744-754, epoch
counters): here params, optimizer state, and EMA params live in a single
sharded PyTree so the whole update — including EMA — is one jitted graph
(collapsing reference engine.py:98-201 into one XLA program).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    model_state: Any = None  # mutable collections (e.g. BatchNorm batch_stats)


def create_train_state(params: Any, tx: optax.GradientTransformation,
                       with_ema: bool = False,
                       model_state: Any = None) -> TrainState:
    """Build the initial state UNDER JIT.

    jit (rather than eager ops) matters beyond compile speed: backends that
    execute through a remote relay (this image's axon platform) never
    materialize eagerly-built arrays to the host, which wedges anything that
    later reads them (e.g. Orbax restore inspecting the template).
    """

    def _init(params, model_state):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(lambda p: p + 0, params) if with_ema else None,
            model_state=model_state if model_state else {},
        )

    return jax.jit(_init)(params, model_state or {})


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """ema <- ema*d + p*(1-d); parity with timm ModelEmaV2 used at
    reference engine.py:198-201."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)
