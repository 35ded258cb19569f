"""Blocked flash attention (online softmax) for long sequences.

The VMEM-resident kernels in flash_attention.py cover the ViT regime
(S <= 1024). This kernel is the long-sequence path (high-res ViTs, e.g.
512px/patch8 -> S=4097): queries are processed in blocks against streamed
K/V blocks with the standard online-softmax running max/sum, so VMEM usage
is O(block^2) instead of O(S^2).

Forward is a Pallas kernel with a custom VJP whose backward recomputes
probabilities blockwise (no (S,S) residuals in HBM). The backward pass uses
two blocked kernels: one accumulating dQ over K blocks, one accumulating
dK/dV over Q blocks.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
BLOCK_Q = 256
BLOCK_K = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scratch, l_scratch, acc_scratch,
                *, scale: float, seq_len: int, block_k: int):
    """Grid (BH, num_q_blocks, num_k_blocks); K is the innermost dim so the
    scratch accumulators carry across K iterations."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0].astype(jnp.float32) * scale             # (BQ, D)
    k = k_ref[0].astype(jnp.float32)                     # (BK, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < seq_len, s, _NEG_INF)

    m_prev = m_scratch[:]                                # (BQ, 1)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)
    l_cur = l_scratch[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scratch[:] = m_cur
    l_scratch[:] = l_cur
    acc_scratch[:] = acc

    @pl.when(kb == nk - 1)
    def _():
        l_fin = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / l_fin).astype(o_ref.dtype)
        # logsumexp per row (FlashAttention-2 residual): bwd rebuilds
        # p = exp(s - L) without an online max
        lse_ref[0] = m_scratch[:] + jnp.log(l_fin)


def _flash_fwd(q, k, v, scale, seq_len, block_q=BLOCK_Q, block_k=BLOCK_K):
    n, sp, d = q.shape
    nq = sp // block_q
    nk = sp // block_k
    grid = (n, nq, nk)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(o_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((n, sp, d), q.dtype),
                   jax.ShapeDtypeStruct((n, sp, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * sp * sp * d,
            bytes_accessed=4 * n * sp * d * q.dtype.itemsize,
            transcendentals=n * sp * sp),
    )(q, k, v)


def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref, dk_scratch, dv_scratch,
                     *, scale: float, seq_len: int, block_k: int):
    """Grid (BH, num_k_blocks, num_q_blocks); Q innermost, dk/dv accumulate
    in fp32 scratch across Q iterations (FlashAttention-2 bwd, kv-stationary).

    Padded q rows need no masking: their do is zero, so dv/ds contributions
    vanish; padded k columns are masked in s before the exp."""
    qb = pl.program_id(2)
    nqb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0]                                          # (BQ, D)
    k = k_ref[0]                                          # (BK, D)
    v = v_ref[0]
    do = do_ref[0]                                        # (BQ, D)
    lse = lse_ref[0]                                      # (BQ, 1)
    delta = delta_ref[0]                                  # (BQ, 1)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    s = s * scale
    kb = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = jnp.exp(s - lse)                                  # (BQ, BK)

    pb = p.astype(do.dtype)
    dv_scratch[:] += jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (BK, D)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (BQ, BK)
    ds = p * (dp - delta)
    dk_scratch[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # (BK, D)

    @pl.when(qb == nqb - 1)
    def _():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scratch,
                   *, scale: float, seq_len: int, block_k: int):
    """Grid (BH, num_q_blocks, num_k_blocks); K innermost, dq accumulates in
    fp32 scratch across K iterations."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kb * block_k
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scratch[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    @pl.when(kb == nkb - 1)
    def _():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, o, lse, do, scale, seq_len,
               block_q=BLOCK_Q, block_k=BLOCK_K):
    n, sp, d = q.shape
    nq = sp // block_q
    nk = sp // block_k
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)               # (N, Sp, 1)

    q_spec_q = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    kv_spec_k = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
    row_spec_q = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0),
                              memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        grid=(n, nk, nq),
        in_specs=[q_spec_q, kv_spec_k, kv_spec_k, q_spec_q, row_spec_q,
                  row_spec_q],
        out_specs=(kv_spec_k, kv_spec_k),
        out_shape=(jax.ShapeDtypeStruct((n, sp, d), k.dtype),
                   jax.ShapeDtypeStruct((n, sp, d), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * n * sp * sp * d,
            bytes_accessed=6 * n * sp * d * q.dtype.itemsize,
            transcendentals=n * sp * sp),
    )(q, k, v, do, lse, delta)

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        grid=(n, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((n, sp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * sp * sp * d,
            bytes_accessed=5 * n * sp * d * q.dtype.itemsize,
            transcendentals=n * sp * sp),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_padded(q, k, v, scale: float, seq_len: int):
    o, _ = _flash_fwd(q, k, v, scale, seq_len)
    return o


def _flash_vjp_fwd(q, k, v, scale, seq_len):
    o, lse = _flash_fwd(q, k, v, scale, seq_len)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(scale, seq_len, res, do):
    """Fully-Pallas blocked backward (FlashAttention-2 style): rebuilds
    p = exp(s − L) from the saved logsumexp, no (S,S) residuals in HBM."""
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, o, lse, do, scale, seq_len)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_padded.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention_blocked(q: jax.Array, k: jax.Array, v: jax.Array,
                            scale: Optional[float] = None) -> jax.Array:
    """Blocked flash attention. q,k,v: (B, H, S, D) -> (B, H, S, D)."""
    b, h, s, d = q.shape
    scale = float(scale if scale is not None else d ** -0.5)
    sp = max(_round_up(s, max(BLOCK_Q, BLOCK_K)), BLOCK_Q)

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))

    o = _flash_attention_padded(prep(q), prep(k), prep(v), scale, s)
    return o[:, :s].reshape(b, h, s, d)
