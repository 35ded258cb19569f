"""AOT export of compiled inference functions.

Serializes a jitted forward (params closed over or passed) with `jax.export`
so serving hosts can load the compiled artifact without retracing Python —
part of the production-serving story the reference lacks entirely.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def export_forward(model, params, image_size: int, batch: int = 1) -> bytes:
    """Serialize model.apply(params, images, deterministic=True) -> bytes."""
    from jax import export as jex

    def forward(params, images):
        return model.apply({"params": params}, images, True)

    spec = (
        jax.tree.map(lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params),
        jax.ShapeDtypeStruct((batch, image_size, image_size, 3), jnp.float32),
    )
    exported = jex.export(jax.jit(forward),
                          platforms=("cpu", "tpu"))(*spec)
    return exported.serialize()


def load_forward(blob: bytes) -> Callable:
    """Deserialize an exported forward; returns fn(params, images)->logits."""
    from jax import export as jex

    exported = jex.deserialize(blob)
    return exported.call
