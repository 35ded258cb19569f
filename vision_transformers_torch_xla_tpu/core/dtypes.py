"""Explicit mixed-precision policy.

The torch_xla reference flips a global env var (`XLA_USE_BF16=1`,
reference main.py:30, run_train.sh:52) to force bf16 everywhere. That is
exactly the anti-pattern a TPU-native design avoids: here precision is an
explicit, per-model policy — params stay fp32 for optimizer stability,
activations/compute run bf16 to hit the MXU at full rate, and reductions
(softmax, layernorm statistics, loss) are done in fp32.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through models and train steps."""

    param_dtype: jnp.dtype = jnp.float32   # master params / optimizer state
    compute_dtype: jnp.dtype = jnp.bfloat16  # matmul / activation dtype
    output_dtype: jnp.dtype = jnp.float32  # logits / loss dtype

    def cast_to_compute(self, tree):
        import jax

        def _cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(self.compute_dtype)
            return x

        return jax.tree.map(_cast, tree)


_POLICIES = {
    "bf16": Policy(jnp.float32, jnp.bfloat16, jnp.float32),
    "fp32": Policy(jnp.float32, jnp.float32, jnp.float32),
    # pure bf16: params also bf16 (halves HBM for very large models; riskier)
    "bf16_pure": Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32),
}


def get_policy(name: str) -> Policy:
    try:
        return _POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown precision policy {name!r}; options: {sorted(_POLICIES)}")
