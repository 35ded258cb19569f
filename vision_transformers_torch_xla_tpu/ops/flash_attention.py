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


def _softmax_p(q, k, scale, seq_len):
    """(H,Sp,D)x(H,Sp,D) -> masked softmax probabilities (H,Sp,Sp), fp32."""
    s = jax.lax.dot_general(q * scale, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _qkv_fwd_kernel(qkv_ref, o_ref, *, scale: float, seq_len: int, h: int):
    """One image per program, heads batched via dot_general batch dims.

    qkv block: (1, Sp, 3H, D) — one contiguous DMA of the fused qkv rows.
    q/k/v stay in (Sp, H, D) layout; the head axis rides the dots as a
    batch dimension, so NO input transposes run on the VPU (the old
    design's (Sp,3H,D)->(H,Sp,D) fp32 transposes were the bottleneck).
    Inputs stay bf16 for native-rate MXU, fp32 accumulation + softmax.
    """
    blk = qkv_ref[0]                                          # (Sp, 3H, D)
    q = blk[:, 0 * h:1 * h, :].transpose(1, 0, 2)             # (H, Sp, D)
    k = blk[:, 1 * h:2 * h, :].transpose(1, 0, 2)
    v = blk[:, 2 * h:3 * h, :].transpose(1, 0, 2)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)     # (H, Sp, Sp)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = _softmax_rows(s)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (H, Sp, D)
    o_ref[0] = o.astype(o_ref.dtype).transpose(1, 0, 2)


def _qkv_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, scale: float,
                    seq_len: int, h: int):
    blk = qkv_ref[0]                                          # (Sp, 3H, D)
    q = blk[:, 0 * h:1 * h, :].transpose(1, 0, 2)             # (H, Sp, D)
    k = blk[:, 1 * h:2 * h, :].transpose(1, 0, 2)
    v = blk[:, 2 * h:3 * h, :].transpose(1, 0, 2)
    do = do_ref[0].transpose(1, 0, 2)                         # (H, Sp, D)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = _softmax_rows(s)                                      # (H, Sq, Sk)
    pb = p.astype(v.dtype)
    dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (H,Sk,D)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (H,Sq,Sk)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(dsb, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dsb, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    out = jnp.concatenate([dq.astype(dqkv_ref.dtype),
                           dk.astype(dqkv_ref.dtype),
                           dv.astype(dqkv_ref.dtype)], axis=0)  # (3H, Sp, D)
    dqkv_ref[0] = out.transpose(1, 0, 2)


def _qkv_specs(sp: int, h: int, d: int):
    qkv_spec = pl.BlockSpec((1, sp, 3 * h, d), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, sp, h, d), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return qkv_spec, o_spec


def _qkv_fwd_call(qkv, scale, seq_len):
    b, sp, three_h, d = qkv.shape
    h = three_h // 3
    qkv_spec, o_spec = _qkv_specs(sp, h, d)
    return pl.pallas_call(
        functools.partial(_qkv_fwd_kernel, scale=scale, seq_len=seq_len,
                          h=h),
        grid=(b,),
        in_specs=[qkv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, sp, h, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=4 * b * h * sp * d * qkv.dtype.itemsize,
            transcendentals=b * h * sp * sp),
    )(qkv)


def _qkv_bwd_call(qkv, do, scale, seq_len):
    b, sp, three_h, d = qkv.shape
    h = three_h // 3
    qkv_spec, o_spec = _qkv_specs(sp, h, d)
    return pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, scale=scale, seq_len=seq_len,
                          h=h),
        grid=(b,),
        in_specs=[qkv_spec, o_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sp * sp * d,
            bytes_accessed=7 * b * h * sp * d * qkv.dtype.itemsize,
            transcendentals=b * h * sp * sp),
    )(qkv, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_attention_qkv_padded(qkv, scale: float, seq_len: int):
    return _qkv_fwd_call(qkv, scale, seq_len)


def _faq_fwd(qkv, scale, seq_len):
    return _qkv_fwd_call(qkv, scale, seq_len), qkv


def _faq_bwd(scale, seq_len, qkv, do):
    return (_qkv_bwd_call(qkv, do, scale, seq_len),)


_fused_attention_qkv_padded.defvjp(_faq_fwd, _faq_bwd)


def fused_attention_qkv(qkv: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """Attention from a fused qkv tensor (B, S, 3, H, D) -> (B, S, H*D).

    One pad copy in, one slice out — no head-major transposes anywhere
    (HBM or VMEM): the kernels slice per-head q/k/v blocks straight out of
    the fused tensor via three BlockSpec index maps.
    """
    b, s, three, h, d = qkv.shape
    assert three == 3
    scale = float(scale if scale is not None else d ** -0.5)
    if s > _MAX_VMEM_SEQ:
        from vision_transformers_torch_xla_tpu.ops.attention import _reference_attention

        qt = qkv.transpose(2, 0, 3, 1, 4)
        o = _reference_attention(qt[0], qt[1], qt[2], scale)
        return o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    sp = max(_round_up(s, 128), 128)
    qkv_m = qkv.reshape(b, s, 3 * h, d)  # pure view: [q_heads, k_heads, v_heads]
    qkv_p = jnp.pad(qkv_m, ((0, 0), (0, sp - s), (0, 0), (0, 0)))
    o = _fused_attention_qkv_padded(qkv_p, scale, s)   # (B, Sp, H, D)
    return o[:, :s].reshape(b, s, h * d)


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
