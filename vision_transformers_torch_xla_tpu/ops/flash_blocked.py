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


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
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
        o_ref[0] = (acc_scratch[:] / jnp.maximum(l_scratch[:], 1e-30)) \
            .astype(o_ref.dtype)


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
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq_len=seq_len,
                          block_k=block_k),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n, sp, d), q.dtype),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_padded(q, k, v, scale: float, seq_len: int):
    return _flash_fwd(q, k, v, scale, seq_len)


def _flash_vjp_fwd(q, k, v, scale, seq_len):
    o = _flash_fwd(q, k, v, scale, seq_len)
    return o, (q, k, v)


def _flash_vjp_bwd(scale, seq_len, res, do):
    """Backward via jnp in fp32, chunked over Q blocks with lax.map to bound
    memory (a fully-Pallas blocked backward is a later-round refinement —
    this already avoids (S,S) residuals in HBM)."""
    q, k, v = res
    n, sp, d = q.shape
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    nq = sp // BLOCK_Q

    col_valid = (jnp.arange(sp) < seq_len)[None, None, :]

    def q_chunk(i):
        qs = jax.lax.dynamic_slice_in_dim(qf, i * BLOCK_Q, BLOCK_Q, axis=1)
        dos = jax.lax.dynamic_slice_in_dim(dof, i * BLOCK_Q, BLOCK_Q, axis=1)
        s = jnp.einsum("nqd,nkd->nqk", qs * scale, kf,
                       preferred_element_type=jnp.float32)
        s = jnp.where(col_valid, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        dv_c = jnp.einsum("nqk,nqd->nkd", p, dos)
        dp = jnp.einsum("nqd,nkd->nqk", dos, vf)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_c = jnp.einsum("nqk,nkd->nqd", ds, kf) * scale
        dk_c = jnp.einsum("nqk,nqd->nkd", ds, qs) * scale
        return dq_c, dk_c, dv_c

    dqs, dks, dvs = jax.lax.map(q_chunk, jnp.arange(nq))
    dq = dqs.transpose(1, 0, 2, 3).reshape(n, sp, d)
    dk = dks.sum(axis=0)
    dv = dvs.sum(axis=0)
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
