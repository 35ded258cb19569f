"""Pallas TPU fused attention for the ViT regime.

ViT attention is short-sequence (197 tokens for 224px/patch16 + cls,
reference SURVEY §5) with head_dim 64 — the entire per-head score matrix fits
comfortably in VMEM, so the fastest TPU design is NOT blocked flash attention
but a single fused kernel per (batch, head): one MXU matmul for Q·Kᵀ, an
in-VMEM fp32 softmax on the VPU, and a second MXU matmul for P·V, with zero
HBM traffic for the intermediates. Padding to the 128-lane boundary is
handled inside the kernel with column masking, so callers can pass the raw
197-token sequence.

A custom VJP recomputes the probability matrix in the backward kernel
(flash-style rematerialization) instead of writing the (S, S) matrix to HBM.

Falls back to the jnp reference for sequences too long for VMEM residency.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_MAX_VMEM_SEQ = 1024  # beyond this, (S,S) fp32 scores stress VMEM -> fallback


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    q = q_ref[0].astype(jnp.float32) * scale                     # (Sp, D)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (Sp, Sp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, seq_len: int):
    """Recompute P, then dV = PᵀdO; dP = dOVᵀ; dS = P⊙(dP − rowsum(dP⊙P));
    dQ = dS·K·scale; dK = dSᵀ·Q·scale."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q * scale, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)                   # (Sp, Sp)

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Sp, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Sp, Sp)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pallas_specs(sp: int, d: int, n: int):
    spec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return spec


def _fwd_call(q, k, v, scale: float, seq_len: int):
    n, sp, d = q.shape
    spec = _pallas_specs(sp, d, n)
    kernel = functools.partial(_fwd_kernel, scale=scale, seq_len=seq_len)
    flops = 4 * sp * sp * d  # 2 matmuls
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, sp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops * n,
            bytes_accessed=4 * n * sp * d * q.dtype.itemsize,
            transcendentals=n * sp * sp,
        ),
    )(q, k, v)


def _bwd_call(q, k, v, do, scale: float, seq_len: int):
    n, sp, d = q.shape
    spec = _pallas_specs(sp, d, n)
    kernel = functools.partial(_bwd_kernel, scale=scale, seq_len=seq_len)
    out_shape = jax.ShapeDtypeStruct((n, sp, d), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        cost_estimate=pl.CostEstimate(
            flops=10 * sp * sp * d * n,
            bytes_accessed=7 * n * sp * d * q.dtype.itemsize,
            transcendentals=n * sp * sp,
        ),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention_padded(q, k, v, scale: float, seq_len: int):
    return _fwd_call(q, k, v, scale, seq_len)


def _fa_fwd(q, k, v, scale, seq_len):
    return _fwd_call(q, k, v, scale, seq_len), (q, k, v)


def _fa_bwd(scale, seq_len, res, do):
    q, k, v = res
    dq, dk, dv = _bwd_call(q, k, v, do, scale, seq_len)
    return dq, dk, dv


_fused_attention_padded.defvjp(_fa_fwd, _fa_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: Optional[float] = None) -> jax.Array:
    """Fused VMEM-resident attention. q,k,v: (B, H, S, D) -> (B, H, S, D)."""
    b, h, s, d = q.shape
    scale = float(scale if scale is not None else d ** -0.5)
    if s > _MAX_VMEM_SEQ:
        from vision_transformers_torch_xla_tpu.ops.attention import _reference_attention

        return _reference_attention(q, k, v, scale)
    sp = max(_round_up(s, 128), 128)
    # pad head_dim only to the fp32 sublane quantum (8): a 64-wide lane dim
    # wastes half the VPU lanes but halves matmul FLOPs vs padding to 128 —
    # measured faster for ViT head_dim 64.
    dp = max(_round_up(d, 8), 8)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, dp - d)))

    o = _fused_attention_padded(prep(q), prep(k), prep(v), scale, s)
    return o[:, :s, :d].reshape(b, h, s, d)
