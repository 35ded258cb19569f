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
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_MAX_VMEM_SEQ = 1024  # beyond this, (S,S) fp32 scores stress VMEM -> fallback


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    """G (batch·head) pairs per program; batched dots, leading batch dim.

    One pair per program is latency-bound on TPU: 1536 grid steps of
    ~8 MFLOP dots leave the MXU idle between DMAs. Batching G pairs per
    program cuts the grid to n/G steps of G-batched dots — big enough to
    pipeline, small enough for VMEM (scores are G·Sp·Sp fp32 scratch).
    Inputs stay bf16 into the MXU; accumulation + softmax in fp32.
    """
    q = q_ref[...]                                               # (G, Sp, D)
    k = k_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (G, Sp, Sp)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[...],
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (G, Sp, D)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, seq_len: int):
    """Recompute P, then dV = PᵀdO; dP = dOVᵀ; dS = P⊙(dP − rowsum(dP⊙P));
    dQ = dS·K·scale; dK = dSᵀ·Q·scale. All dots G-batched, leading batch."""
    q = q_ref[...]                                               # (G, Sp, D)
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)                   # (G, Sp, Sp)
    pb = p.astype(do.dtype)

    dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (G, Sp, D)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (G, Sp, Sp)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(dsb, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(dsb, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)

    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pick_g(n: int, sp: int, budget: int) -> int:
    """Largest G dividing n whose fp32 score scratch fits the VMEM budget."""
    g = max(1, budget // (sp * sp * 4))
    while g > 1 and n % g:
        g -= 1
    return g


def _pallas_specs(sp: int, d: int, g: int):
    return pl.BlockSpec((g, sp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale: float, seq_len: int):
    n, sp, d = q.shape
    g = _pick_g(n, sp, 8 * 1024 * 1024)
    spec = _pallas_specs(sp, d, g)
    kernel = functools.partial(_fwd_kernel, scale=scale, seq_len=seq_len)
    flops = 4 * sp * sp * d  # 2 matmuls
    return pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, sp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops * n,
            bytes_accessed=4 * n * sp * d * q.dtype.itemsize,
            transcendentals=n * sp * sp,
        ),
    )(q, k, v)


def _bwd_call(q, k, v, do, scale: float, seq_len: int):
    n, sp, d = q.shape
    g = _pick_g(n, sp, 4 * 1024 * 1024)  # bwd holds p, dp, ds concurrently
    spec = _pallas_specs(sp, d, g)
    kernel = functools.partial(_bwd_kernel, scale=scale, seq_len=seq_len)
    out_shape = jax.ShapeDtypeStruct((n, sp, d), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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


def _hp_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                   seq_len: int, d: int):
    """Head-pair program: blocks are (G, Sp, 2D) lane-aligned slices taken
    straight from the fused qkv matmul output (B, Sp, 3·H·D) via three
    BlockSpec index maps — the DMA engine does the head gather, so there
    are NO transposes anywhere (HBM or VMEM). Two D=64 heads share a
    128-lane block; each is a lane-slice fed to G-batched dots.

    The kernel is VPU-bound, not MXU-bound (fp32 elementwise over the
    (Sq, Sk) score matrix dominates), so every full-size pass counts:
    scale is folded into q (Sq×D, 4x smaller), the ragged-lane mask
    compare is hoisted out of the half loop, and the softmax division
    moves AFTER the P·V dot onto (Sq, D) data."""
    g, sq = q_ref.shape[0], q_ref.shape[1]
    # boolean keep-mask, built ONCE per program: True on real columns,
    # False on Mosaic's internal lane padding (k rows are zero-filled
    # there, which would otherwise contribute exp(0-m) to the row sums).
    # Must stay a bool + per-half select: an additive -inf bias tensor
    # derived from the iota keeps a lane-replicated layout that Mosaic's
    # vector layout pass cannot relayout for the add (`Check failed:
    # limits[i] <= dim(i)` in vector_extract_slice_impl).
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sq), 2)
    keep = col < seq_len
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        q = (q_ref[:, :, sl] * scale).astype(q_ref.dtype)     # (G, Sp, D)
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = jnp.where(keep, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)                                    # unnormalized
        r = jnp.sum(p, axis=-1, keepdims=True)                # (G, Sq, 1)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * (1.0 / r)                 # normalize on (Sq, D), not (Sq, Sk)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _hp_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                   *, scale: float, seq_len: int, d: int):
    """Backward head-pair program: recompute P (flash-style), then the five
    gradient dots, all G-batched with leading batch dims. dq/dk/dv are
    separate (B, Sp, H·D) outputs (Mosaic rejects mid-dim int stores into
    one (B, Sp, 3, H·D) buffer); the caller concatenates — one copy."""
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        do = do_ref[:, :, sl]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < seq_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)             # (G, Sq, Sk)
        pb = p.astype(do.dtype)
        dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq = jax.lax.dot_general(dsb, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(dsb, q, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dq_ref[:, :, sl] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[:, :, sl] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _hp_in_specs(g: int, sp: int, d: int, h: int):
    """q/k/v column-region specs over the fused (B, Sp, 3·H·D) tensor.
    Grid is (B/G, H/2); program (i, j) reads heads (2j, 2j+1)."""
    two_d = 2 * d
    hp = h // 2
    q = pl.BlockSpec((g, sp, two_d), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
    k = pl.BlockSpec((g, sp, two_d), lambda i, j: (i, 0, hp + j),
                     memory_space=pltpu.VMEM)
    v = pl.BlockSpec((g, sp, two_d), lambda i, j: (i, 0, 2 * hp + j),
                     memory_space=pltpu.VMEM)
    return q, k, v


def _pick_hp_g(b: int, cap: int = 16) -> int:
    """Largest power-of-two ≤ cap dividing the (possibly per-shard) batch."""
    g = cap
    while g > 1 and b % g:
        g //= 2
    return g


def _hp_fwd_call(qkv, scale, seq_len, h, d):
    b, sp, _ = qkv.shape
    g = _pick_hp_g(b)
    qs, ks, vs = _hp_in_specs(g, sp, d, h)
    os_ = pl.BlockSpec((g, sp, 2 * d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hp_fwd_kernel, scale=scale, seq_len=seq_len, d=d),
        grid=(b // g, h // 2),
        in_specs=[qs, ks, vs],
        out_specs=os_,
        out_shape=jax.ShapeDtypeStruct((b, sp, h * d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=4 * b * h * sp * d * qkv.dtype.itemsize,
            transcendentals=b * h * sp * sp),
    )(qkv, qkv, qkv)


def _hp_fwd_stats_kernel(q_ref, k_ref, v_ref, o_ref, st_ref, *, scale: float,
                         seq_len: int, d: int):
    """_hp_fwd_kernel that ALSO saves the softmax row stats for the
    backward: per head pair the st block's 4 lanes are
    [m_half0, m_half1, rinv_half0, rinv_half1]. The backward recompute
    then skips the row-max and row-sum reduction passes over the (Sq, Sk)
    score matrix — the two most expensive VPU passes it had — at the cost
    of a (B, Sq, 2H) f32 residual (~1.2 MB for ViT-B/128, vs the ~230 MB
    it would take to save P itself)."""
    g, sq = q_ref.shape[0], q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sq), 2)
    keep = col < seq_len
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        q = (q_ref[:, :, sl] * scale).astype(q_ref.dtype)
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = jnp.where(keep, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        rinv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)       # (G, Sq, 1)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[:, :, sl] = (o * rinv).astype(o_ref.dtype)
        st_ref[0, :, :, half:half + 1] = m
        st_ref[0, :, :, 2 + half:3 + half] = rinv


def _hp_fwd_stats_call(qkv, scale, seq_len, h, d):
    b, sp, _ = qkv.shape
    g = _pick_hp_g(b)
    qs, ks, vs = _hp_in_specs(g, sp, d, h)
    os_ = pl.BlockSpec((g, sp, 2 * d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    # stats live head-pair-major, (H/2, B, Sp, 4): the (Sp, 4) block tail
    # matches the array tail exactly (Mosaic's block-shape rule), and the
    # batch dim stays shardable at position 1
    sts = pl.BlockSpec((1, g, sp, 4), lambda i, j: (j, i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hp_fwd_stats_kernel, scale=scale,
                          seq_len=seq_len, d=d),
        grid=(b // g, h // 2),
        in_specs=[qs, ks, vs],
        out_specs=(os_, sts),
        out_shape=(jax.ShapeDtypeStruct((b, sp, h * d), qkv.dtype),
                   jax.ShapeDtypeStruct((h // 2, b, sp, 4), jnp.float32)),
        # dimension_semantics: semantically safe (grid programs write
        # disjoint blocks, no cross-step accumulation); in-step A/B on the
        # v5e chip measured NEUTRAL (104.33 ms/step with vs 104.36-104.43
        # without, r5 bench at HEAD) — kept on the two hottest kernels
        # where the A/B ran; sibling calls omit it (no measured benefit)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * d,
            bytes_accessed=4 * b * h * sp * d * qkv.dtype.itemsize,
            transcendentals=b * h * sp * sp),
    )(qkv, qkv, qkv)


def _hp_bwd_call(qkv, do, scale, seq_len, h, d):
    b, sp, _ = qkv.shape
    g = _pick_hp_g(b, cap=8)  # bwd holds p, dp, ds concurrently in VMEM
    qs, ks, vs = _hp_in_specs(g, sp, d, h)
    dos = pl.BlockSpec((g, sp, 2 * d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    g_shape = jax.ShapeDtypeStruct((b, sp, h * d), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_hp_bwd_kernel, scale=scale, seq_len=seq_len, d=d),
        grid=(b // g, h // 2),
        in_specs=[qs, ks, vs, dos],
        out_specs=(dos, dos, dos),
        out_shape=(g_shape, g_shape, g_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sp * sp * d,
            bytes_accessed=7 * b * h * sp * d * qkv.dtype.itemsize,
            transcendentals=b * h * sp * sp),
    )(qkv, qkv, qkv, do)
    return jnp.concatenate([dq, dk, dv], axis=-1)  # [dq | dk | dv]


def _batch_partitioned(raw_fn, out_rank: int, rule: str = "b s c -> b s o",
                       repl: tuple = ("s", "c", "o"),
                       out_batch_dims: tuple = None,
                       arg_batch_dims: tuple = None):
    """Wrap a batch-parallel kernel call in jax custom_partitioning so GSPMD
    runs it per-shard along the leading (batch) dim instead of replicating
    the Mosaic custom call (which would all-gather the global batch on a
    pod). Sequence/feature dims are forced replicated; the batch dim keeps
    whatever mesh axes the operand carries (data/fsdp)."""
    from jax.sharding import NamedSharding, PartitionSpec

    cp = custom_partitioning(raw_fn)

    def _batch_axes(shape_with_sharding):
        sh = shape_with_sharding.sharding
        spec = getattr(sh, "spec", None)
        return spec[0] if spec else None

    def _lead_batch(mesh, batch, rank, bdim=0):
        spec = [None] * rank
        if bdim is not None:  # bdim None = no batch dim (e.g. weights)
            spec[bdim] = batch
        return NamedSharding(mesh, PartitionSpec(*spec))

    def _out_shardings(mesh, batch, result_shape):
        if isinstance(result_shape, (list, tuple)):
            bds = out_batch_dims or (0,) * len(result_shape)
            return tuple(_lead_batch(mesh, batch, len(r.shape), bd)
                         for r, bd in zip(result_shape, bds))
        return _lead_batch(mesh, batch, out_rank)

    def infer(mesh, arg_shapes, result_shape):
        return _out_shardings(mesh, _batch_axes(arg_shapes[0]), result_shape)

    def prop(mesh, user_shape):
        u = user_shape[0] if isinstance(user_shape, (list, tuple)) \
            else user_shape
        spec = PartitionSpec(_batch_axes(u), *([None] * (out_rank - 1)))
        return NamedSharding(mesh, spec)

    def part(mesh, arg_shapes, result_shape):
        batch = _batch_axes(arg_shapes[0])
        abds = arg_batch_dims or (0,) * len(arg_shapes)
        arg_shardings = tuple(
            _lead_batch(mesh, batch, len(a.shape), bd)
            for a, bd in zip(arg_shapes, abds))
        return mesh, raw_fn, _out_shardings(mesh, batch, result_shape), \
            arg_shardings

    cp.def_partition(partition=part, infer_sharding_from_operands=infer,
                     propagate_user_sharding=prop,
                     # Shardy path: same contract as the GSPMD callbacks —
                     # batch factor propagates, everything else replicated
                     sharding_rule=rule,
                     need_replication_factors=repl)
    return cp


@functools.lru_cache(maxsize=None)
def _hp_partitioned(scale: float, seq_len: int, h: int, d: int):
    fwd_p = _batch_partitioned(
        lambda qkv: _hp_fwd_call(qkv, scale, seq_len, h, d), out_rank=3)
    bwd_p = _batch_partitioned(
        lambda qkv, do: _hp_bwd_call(qkv, do, scale, seq_len, h, d),
        out_rank=3, rule="b s c, b s o -> b s c", repl=("s", "c", "o"))

    @jax.custom_vjp
    def attn(qkv):
        return fwd_p(qkv)

    def attn_fwd(qkv):
        return fwd_p(qkv), qkv

    def attn_bwd(qkv, do):
        return (bwd_p(qkv, do),)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def fused_attention_qkv_cols(qkv: jax.Array, num_heads: int,
                             scale: Optional[float] = None) -> jax.Array:
    """Attention straight off the fused qkv projection output.

    qkv: (B, S, 3·H·D) laid out [q_heads | k_heads | v_heads] — the natural
    output of the fused qkv Dense, with NO reshape/transpose between the
    matmul and the kernel (the reference materializes (3,B,H,S,D) copies,
    ~12% of its step; reference models/vision_transformer.py:58-62).
    Head pairs ride 128-lane blocks; grid (B/G, H/2); one pad copy in,
    one slice out. Returns (B, S, H·D).
    """
    b, s, three_hd = qkv.shape
    h = num_heads
    d = three_hd // (3 * h)
    if d % 64 or h % 2:
        raise ValueError(f"head_dim {d} must be a multiple of 64 and "
                         f"num_heads {h} even for the head-pair kernel")
    scale = float(scale if scale is not None else d ** -0.5)
    if s > _MAX_VMEM_SEQ:
        # long sequences (hi-res ViTs): (S, S) scores no longer fit VMEM —
        # route through the blocked online-softmax flash kernel
        from vision_transformers_torch_xla_tpu.ops.flash_blocked import (
            flash_attention_blocked,
        )

        t = qkv.reshape(b, s, 3, h, d).transpose(2, 0, 3, 1, 4)
        o = flash_attention_blocked(t[0], t[1], t[2], scale)
        return o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    # no pad/slice: a block sublane dim equal to the array's ragged seq dim
    # is legal, Mosaic pads reads internally (zero-fill, verified on v5e —
    # the score column mask keeps correctness independent of the fill) and
    # masks the partial-block store. Saved ~6 ms/step of pad ops at S=197.
    o = _hp_partitioned(scale, s, h, d)(qkv)
    return o


def _hp_bwd_pi_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, st_ref, dpi_ref,
                      dbp_ref, *, scale: float, seq_len: int, d: int):
    """Backward head-pair program writing ONE pair-interleaved output block.

    dpi block = (G, Sp, 6D) columns [dq_pair | dk_pair | dv_pair] (2D lanes
    each): the whole dqkv cotangent lands in a single (B, Sp, 3·H·D) buffer
    with NO downstream concatenate (the old 3-output form cost ~3.6 ms/step
    of dynamic-update-slice copies re-assembling dqkv for the projection
    backward). The column order differs from the fused qkv layout by a
    static permutation that the caller folds into the weight matrix.

    VPU-pass economy (the kernel is fp32-elementwise-bound, not MXU-bound):
    the softmax recompute keeps p UNNORMALIZED and folds 1/rowsum into the
    small (Sq, D) operands of each gradient dot instead of dividing the
    (Sq, Sk) matrix; the softmax-jacobian row term uses the flash identity
    rowsum(dP ⊙ P) = rowsum(dO ⊙ O) on (Sq, D) data (requires the fwd
    output O, which autodiff already keeps alive as the input of the
    output projection — zero extra residual memory).

    dbp is the qkv-bias gradient reduced over the SEQUENCE axis only:
    (H/2, B, 6D) f32 per-sample partials in pair-interleaved column order
    (same as dpi). dqkv is already in VMEM here, so the per-row sums are a
    few VPU reductions — versus the ~1.4 GB/step HBM re-read (measured
    2.0 ms on v5e at 82% of HBM peak, i.e. unclaimable by any
    reduce-to-dot rewrite) that a downstream jnp.sum over dpi costs. The
    caller finishes with a tiny (H/2, B, 6D) -> (3HD,) sum+unpermute in
    XLA; keeping the batch axis un-reduced keeps the output shardable
    exactly like st."""
    g, sq = q_ref.shape[0], q_ref.shape[1]
    # bool keep-mask + select (NOT an additive bias — see _hp_fwd_kernel)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, sq, sq), 2)
    keep = col < seq_len
    for half in range(2):
        sl = slice(half * d, (half + 1) * d)
        q = (q_ref[:, :, sl] * scale).astype(q_ref.dtype)   # pre-scaled q̂
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        do = do_ref[:, :, sl]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = jnp.where(keep, s, _NEG_INF)
        # row stats come from the forward kernel (st: [m0, m1, r⁻¹0, r⁻¹1])
        # — skips the two reduction passes over the (Sq, Sk) matrix. The
        # recomputed s is bitwise-identical to the forward's (same MXU dot
        # on the same operands), so the saved stats are exact.
        m = st_ref[0, :, :, half:half + 1]                   # (G, Sq, 1)
        rinv = st_ref[0, :, :, 2 + half:3 + half]
        pu = jnp.exp(s - m)                                  # unnormalized
        pub = pu.astype(do.dtype)

        do32 = do.astype(jnp.float32)
        # dv = Pᵀ·dO = puᵀ·(dO ⊙ 1/r)  — fold the normalizer into dO
        do_n = (do32 * rinv).astype(do.dtype)
        dv = jax.lax.dot_general(pub, do_n, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # delta = rowsum(dP ⊙ P) = rowsum(dO ⊙ O): (Sq, D) not (Sq, Sk)
        delta = jnp.sum(do32 * o_ref[:, :, sl].astype(jnp.float32),
                        axis=-1, keepdims=True)              # (G, Sq, 1)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        t = ((dp - delta) * pu).astype(q.dtype)   # ds = t ⊙ 1/r (folded out)
        # dq = dS·K·scale = diag(1/r)·(t·K)·scale — fold scale·1/r post-dot
        dq = jax.lax.dot_general(t, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dq = dq * (rinv * scale)
        # dk = dSᵀ·Q·scale = tᵀ·(q̂ ⊙ 1/r)  (q̂ already carries scale)
        qn = (q.astype(jnp.float32) * rinv).astype(q.dtype)
        dk = jax.lax.dot_general(t, qn, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dt_ = dpi_ref.dtype
        dpi_ref[:, :, half * d:(half + 1) * d] = dq.astype(dt_)
        dpi_ref[:, :, 2 * d + half * d:2 * d + (half + 1) * d] = \
            dk.astype(dt_)
        dpi_ref[:, :, 4 * d + half * d:4 * d + (half + 1) * d] = \
            dv.astype(dt_)
        # per-sample qkv-bias partials: sum the fp32 gradients over the
        # sequence axis while they are still VMEM-resident (see docstring).
        # dq carries rinv*scale above; dk/dv folded their factors pre-dot.
        dbp_ref[0, :, half * d:(half + 1) * d] = jnp.sum(dq, axis=1)
        dbp_ref[0, :, 2 * d + half * d:2 * d + (half + 1) * d] = \
            jnp.sum(dk, axis=1)
        dbp_ref[0, :, 4 * d + half * d:4 * d + (half + 1) * d] = \
            jnp.sum(dv, axis=1)


def _hp_bwd_pi_call(qkv, do, o, st, scale, seq_len, h, d):
    b, sp, _ = qkv.shape
    g = _pick_hp_g(b, cap=8)
    qs, ks, vs = _hp_in_specs(g, sp, d, h)
    dos = pl.BlockSpec((g, sp, 2 * d), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    sts = pl.BlockSpec((1, g, sp, 4), lambda i, j: (j, i, 0, 0),
                       memory_space=pltpu.VMEM)
    dpis = pl.BlockSpec((g, sp, 6 * d), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    # per-sample qkv-bias partials, head-pair-major like st: (H/2, B, 6D)
    dbps = pl.BlockSpec((1, g, 6 * d), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hp_bwd_pi_kernel, scale=scale, seq_len=seq_len,
                          d=d),
        grid=(b // g, h // 2),
        in_specs=[qs, ks, vs, dos, dos, sts],
        out_specs=(dpis, dbps),
        out_shape=(jax.ShapeDtypeStruct((b, sp, 3 * h * d), qkv.dtype),
                   jax.ShapeDtypeStruct((h // 2, b, 6 * d), jnp.float32)),
        # dimension_semantics: measured NEUTRAL in-step at HEAD (see the
        # matching note on _hp_fwd_stats_call); safe, kept, not propagated
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sp * sp * d,
            bytes_accessed=9 * b * h * sp * d * qkv.dtype.itemsize,
            transcendentals=b * h * sp * sp),
    )(qkv, qkv, qkv, do, o, st)


def _pi_perm(h: int, d: int):
    """Pair-interleaved column c -> standard fused-qkv column.

    Standard layout (B, S, 3·H·D): [q_heads | k_heads | v_heads], head pairs
    of 2D lanes. Pair-interleaved (what _hp_bwd_pi_kernel writes): for each
    head pair j, 6D columns [dq_j | dk_j | dv_j]."""
    import numpy as np

    c = np.arange(3 * h * d)
    j, r = c // (6 * d), c % (6 * d)
    kind, lane = r // (2 * d), r % (2 * d)
    perm = kind * h * d + j * 2 * d + lane
    inv = np.empty_like(perm)
    inv[perm] = c
    return perm, inv


@functools.lru_cache(maxsize=None)
def _qkv_proj_attention(scale: float, seq_len: int, h: int, d: int,
                        has_bias: bool):
    """custom_vjp spanning the fused qkv projection AND the attention core.

    Forward: qkv = x·W (+bias) in compute dtype, then the head-pair Pallas
    kernel. Backward: the Pallas kernel emits the full dqkv cotangent as ONE
    pair-interleaved buffer; the projection backward contracts it against a
    column-permuted copy of W (static gather, ~7 MB — vs ~230 MB/block of
    concatenate traffic in the 3-output formulation). Weight/bias grads are
    fp32 via preferred_element_type, matching the autodiff path exactly
    (tests/test_pallas_attention.py::test_qkv_proj_attention_grads)."""
    fwd_p = _batch_partitioned(
        lambda qkv: _hp_fwd_stats_call(qkv, scale, seq_len, h, d),
        out_rank=3, rule="b s c -> b s o, p b s t",
        repl=("s", "c", "o", "t", "p"), out_batch_dims=(0, 1))
    bwd_p = _batch_partitioned(
        lambda qkv, do, o, st: _hp_bwd_pi_call(qkv, do, o, st, scale,
                                               seq_len, h, d),
        out_rank=3, rule="b s c, b s o, b s o, p b s t -> b s c, p b v",
        repl=("s", "c", "o", "t", "p", "v"), arg_batch_dims=(0, 0, 0, 1),
        out_batch_dims=(0, 1))
    perm, inv = _pi_perm(h, d)

    def project(x, w, b):
        qkv = jnp.einsum("bsd,dc->bsc", x, w.astype(x.dtype))
        if b is not None:
            qkv = qkv + b.astype(x.dtype)
        return qkv

    def call(x, w, b):
        return fwd_p(project(x, w, b))[0]

    def call_fwd(x, w, b):
        qkv = project(x, w, b)
        # o rides along for the flash rowsum(dO⊙O) identity (autodiff keeps
        # it alive anyway as the input of the output projection); st holds
        # the softmax row max + 1/rowsum so the bwd recompute skips both
        # (Sq, Sk) reduction passes
        o, st = fwd_p(qkv)
        return o, (x, qkv, o, st, w)

    def call_bwd(res, do):
        x, qkv, o, st, w = res
        # (B, S, 3HD) pair-interleaved + (H/2, B, 6D) per-sample db partials
        dpi, dbp = bwd_p(qkv, do, o, st)
        # pair-interleave W's columns with a static gather. (A/B'd against
        # the reshape+transpose formulation on v5e: the gather fusion costs
        # ~0.5 ms/step but the transpose variant regressed the whole step
        # 104.8 -> 108.0 ms — XLA's layout choices around the transposed
        # operand are worse than the gather.)
        wp = w[:, perm].astype(dpi.dtype)
        dx = jnp.einsum("bsc,dc->bsd", dpi, wp)
        dw_pi = jnp.einsum("bsd,bsc->dc", x, dpi,
                           preferred_element_type=jnp.float32)
        dw = dw_pi[:, inv].astype(w.dtype)
        if not has_bias:
            return dx, dw
        # finish the kernel's sequence-reduced partials: sum the batch axis
        # (2.4 MB vs the 1.4 GB dpi re-read) and undo the pair interleave
        db = jnp.sum(dbp, axis=1).reshape(3 * h * d)[inv]
        return dx, dw, db

    if has_bias:
        f = jax.custom_vjp(call)
        f.defvjp(call_fwd, call_bwd)
        return f

    f = jax.custom_vjp(lambda x, w: call(x, w, None))
    f.defvjp(lambda x, w: call_fwd(x, w, None), call_bwd)
    return f


def qkv_proj_attention(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
                       num_heads: int,
                       scale: Optional[float] = None) -> jax.Array:
    """Fused qkv projection + head-pair attention with a concat-free VJP.

    x: (B, S, D); w: (D, 3·H·hd) standard fused-qkv layout (same param as
    the plain Dense path — checkpoints interchange freely); b: (3·H·hd,) or
    None. Returns (B, S, H·hd). Short-seq VMEM-resident regime only — the
    caller routes long sequences through the blocked flash kernel."""
    _, s, _ = x.shape
    h = num_heads
    d = w.shape[1] // (3 * h)
    if d % 64 or h % 2:
        raise ValueError(f"head_dim {d} must be a multiple of 64 and "
                         f"num_heads {h} even for the head-pair kernel")
    scale = float(scale if scale is not None else d ** -0.5)
    fn = _qkv_proj_attention(scale, s, h, d, b is not None)
    return fn(x, w, b) if b is not None else fn(x, w)


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
