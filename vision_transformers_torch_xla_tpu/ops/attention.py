"""Multi-head attention dispatch: Pallas fused kernel on TPU, jnp elsewhere.

TPU-native replacement for the reference's reliance on PyTorch SDPA
(`use_fused_attn()` / `F.scaled_dot_product_attention` inside timm, referenced
at reference models/vision_transformer.py:48-63). The jnp path is the
correctness reference and the CPU-test path; the Pallas path is the hot path
for the ViT regime (short sequence, head_dim 64, everything VMEM-resident).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _reference_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: Optional[float] = None) -> jax.Array:
    """Plain jnp softmax attention. q,k,v: (B, H, S, D). fp32 softmax."""
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def masked_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """Attention with an additive mask broadcastable to (B, H, Q, K).

    Parity with the reference ViT's attn_mask plumb-through
    (reference vision_transformer.py:992 via maybe_add_mask).
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + mask.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attention_bshd(q: jax.Array, k: jax.Array, v: jax.Array,
                   scale: Optional[float] = None) -> jax.Array:
    """Softmax attention in (B, S, H, D) layout — no head transposes.

    The (B,H,S,D) layout forces XLA to materialize big copy ops for the
    head-major transpose (measured ~11% of the ViT-B step); dot_general
    handles the head axis as a batch dim in place.
    """
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "use_pallas"))
def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         scale: Optional[float] = None,
                         use_pallas: bool = False) -> jax.Array:
    """Fused softmax attention. Inputs (B, H, S, D) -> output (B, H, S, D)."""
    if use_pallas:
        from vision_transformers_torch_xla_tpu.ops.flash_attention import fused_attention

        return fused_attention(q, k, v, scale=scale)
    return _reference_attention(q, k, v, scale)
