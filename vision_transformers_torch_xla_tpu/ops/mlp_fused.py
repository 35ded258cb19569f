"""Pallas TPU fused MLP backward for the transformer-block MLP.

Forward of the block MLP (reference models/vision_transformer.py Mlp via
timm, fc1 -> gelu(tanh) -> fc2) is two large matmuls XLA already schedules
at near-peak MXU, so the forward stays in XLA. The backward is where the
profiled slack lives (~4 ms/step of elementwise passes on ViT-B/128, v5e):
autodiff materializes da = dy @ W2ᵀ to HBM, re-reads it together with h for
the dgelu multiply, writes dh, then re-reads dh once more for the fc1 bias
reduction. This kernel fuses all of that into the single matmul pass that
produces da anyway:

    dh   = (dy @ W2ᵀ) ⊙ gelu'(h)        one MXU dot + VPU epilogue
    a    = gelu(h)                       tanh(u) is already computed for
                                         gelu'; a feeds the dW2 matmul, so
                                         the fwd need not keep it as a
                                         residual (saves (B,S,H) bf16 of
                                         fwd->bwd liveness)
    db1  = Σ_{b,s} dh                    fp32 row partials, summed by XLA
                                         over a tiny (B, H) buffer

dx / dW1 / dW2 / db2 stay XLA matmuls/reductions on dh, a, dy.

The da intermediate never exists in HBM, the dgelu pass disappears, and the
db1 reduction rides the same VMEM residency. All dots accumulate fp32;
gelu'/gelu are evaluated in fp32 from the bf16 h (tighter than autodiff's
bf16 elementwise chain).

Used by models.layers.Mlp when `use_pallas=True` and the shape/recipe
qualifies (plain gelu, no dropout, lane-aligned widths); the param tree is
identical to the nn.Dense path so checkpoints interchange freely.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_torch_xla_tpu.ops.flash_attention import (
    _batch_partitioned,
)

_SQRT_2_OVER_PI = 0.7978845608028654  # sqrt(2/pi), gelu tanh constant
_GELU_C = 0.044715


def _gelu_tanh_val_grad(hf: jax.Array):
    """(gelu(h), gelu'(h)) for the tanh approximation, fp32 in/out.

    g(x)  = 0.5 x (1 + tanh(u)),  u = c (x + 0.044715 x^3)
    g'(x) = 0.5 (1 + t) + 0.5 x (1 - t^2) c (1 + 3*0.044715 x^2)
    """
    c = _SQRT_2_OVER_PI
    u = c * (hf + _GELU_C * hf * hf * hf)
    t = jnp.tanh(u)
    val = 0.5 * hf * (1.0 + t)
    grad = 0.5 * (1.0 + t) + 0.5 * hf * (1.0 - t * t) * c * (
        1.0 + 3.0 * _GELU_C * hf * hf)
    return val, grad


def _fc2_bwd_kernel(dy_ref, w2_ref, h_ref, dh_ref, a_ref, db1_ref):
    """One program = G images: dh/a/db1 for the whole hidden width.

    dy (G, S, O) bf16; w2 (K, O) bf16 (full fc2 weight, block-constant so
    Mosaic DMAs it once); h (G, S, K) bf16. K/O are lane-aligned; S rides
    the sublane dim (any value, Mosaic pads internally).
    """
    dy = dy_ref[...]
    w2 = w2_ref[...]
    da = jax.lax.dot_general(dy, w2, (((2,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (G, S, K)
    hf = h_ref[...].astype(jnp.float32)
    a, gp = _gelu_tanh_val_grad(hf)
    dh = da * gp
    dh_ref[...] = dh.astype(dh_ref.dtype)
    a_ref[...] = a.astype(a_ref.dtype)
    # fp32 partial of db1 for this program, parked in the image-block's
    # first row of the (B, 1, K) partial buffer (other rows zero) — XLA
    # sums the tiny buffer afterwards. Keeps the 'b' batch factor literal
    # in every output so the sharding rule stays consistent; the singleton
    # middle dim makes the block's last-two dims equal the array's, which
    # satisfies Mosaic's (8, 128) tiling rule for any image-block size g.
    partial = jnp.sum(dh, axis=(0, 1))                            # (K,)
    g = dh.shape[0]
    row = jax.lax.broadcasted_iota(
        jnp.int32, (g, 1, partial.shape[0]), 0)
    db1_ref[...] = jnp.where(row == 0, partial[None, None, :], 0.0)


def _pick_g(b: int, s: int, k: int, budget: int = 24 * 1024 * 1024) -> int:
    """Largest power-of-two image count whose fp32 working set fits VMEM."""
    g = 8
    # dominant live fp32 buffers: da/hf/dh ~ 3x (g, S, K) f32
    while g > 1 and (b % g or 3 * g * s * k * 4 > budget):
        g //= 2
    return g


def _fc2_bwd_call(dy: jax.Array, w2: jax.Array, h: jax.Array):
    b, s, o = dy.shape
    k = h.shape[-1]
    g = _pick_g(b, s, k)
    dy_spec = pl.BlockSpec((g, s, o), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((k, o), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((g, s, k), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    db1_spec = pl.BlockSpec((g, 1, k), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fc2_bwd_kernel,
        grid=(b // g,),
        in_specs=[dy_spec, w2_spec, h_spec],
        out_specs=(h_spec, h_spec, db1_spec),
        out_shape=(jax.ShapeDtypeStruct((b, s, k), h.dtype),
                   jax.ShapeDtypeStruct((b, s, k), h.dtype),
                   jax.ShapeDtypeStruct((b, 1, k), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * o * k,
            bytes_accessed=(b * s * (o + 3 * k) + k * o) * dy.dtype.itemsize
            + b * k * 4,
            transcendentals=b * s * k,
        ),
    )(dy, w2, h)


@functools.lru_cache(maxsize=None)
def _mlp_gelu(use_bias: bool):
    """custom_vjp for fc1 -> gelu(tanh) -> fc2 with the fused Pallas backward.

    Residuals are (x, h, w1, w2) only — `a` is regenerated by the backward
    kernel from the tanh it computes anyway, so it never persists from the
    forward. Weight/bias grads accumulate fp32 (at least as tight as the
    autodiff path; tests/test_mlp_fused.py checks all five cotangents).
    """
    bwd_p = _batch_partitioned(
        _fc2_bwd_call,
        out_rank=3, rule="b s o, k o, b s k -> b s k, b s k, b u k",
        repl=("s", "o", "k", "u"), arg_batch_dims=(0, None, 0),
        out_batch_dims=(0, 0, 0))

    def fwd_math(x, w1, b1, w2, b2):
        h = jnp.einsum("bsd,dk->bsk", x, w1.astype(x.dtype))
        if b1 is not None:
            h = h + b1.astype(x.dtype)
        a = jax.nn.gelu(h, approximate=True)
        y = jnp.einsum("bsk,ko->bso", a, w2.astype(x.dtype))
        if b2 is not None:
            y = y + b2.astype(x.dtype)
        return y, h

    def call(x, w1, b1, w2, b2):
        return fwd_math(x, w1, b1, w2, b2)[0]

    def call_fwd(x, w1, b1, w2, b2):
        y, h = fwd_math(x, w1, b1, w2, b2)
        return y, (x, h, w1, w2)

    def call_bwd(res, dy):
        x, h, w1, w2 = res
        dh, a, db1_rows = bwd_p(dy, w2.astype(dy.dtype), h)
        dx = jnp.einsum("bsk,dk->bsd", dh, w1.astype(dh.dtype))
        dw1 = jnp.einsum("bsd,bsk->dk", x, dh,
                         preferred_element_type=jnp.float32).astype(w1.dtype)
        dw2 = jnp.einsum("bsk,bso->ko", a, dy,
                         preferred_element_type=jnp.float32).astype(w2.dtype)
        if not use_bias:
            return dx, dw1, dw2
        db1 = jnp.sum(db1_rows, axis=(0, 1))
        db2 = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
        return dx, dw1, db1, dw2, db2

    if use_bias:
        f = jax.custom_vjp(call)
        f.defvjp(call_fwd, call_bwd)
        return f

    f = jax.custom_vjp(lambda x, w1, w2: call(x, w1, None, w2, None))
    f.defvjp(lambda x, w1, w2: call_fwd(x, w1, None, w2, None), call_bwd)
    return f


def mlp_gelu(x: jax.Array, w1: jax.Array, b1: Optional[jax.Array],
             w2: jax.Array, b2: Optional[jax.Array]) -> jax.Array:
    """Transformer MLP (fc1 -> tanh-gelu -> fc2) with a fused Pallas VJP.

    x: (B, S, D); w1: (D, H); w2: (H, D_out); biases optional but paired
    (both or neither — matching Mlp.use_bias). D/D_out/H must be 128-lane
    aligned; the caller (models.layers.Mlp) falls back to the plain Dense
    path otherwise.
    """
    if (b1 is None) != (b2 is None):
        raise ValueError("mlp_gelu: biases must be both present or both absent")
    if x.shape[-1] % 128 or w1.shape[1] % 128 or w2.shape[1] % 128:
        raise ValueError(
            f"mlp_gelu needs 128-lane-aligned widths, got "
            f"d={x.shape[-1]} hidden={w1.shape[1]} out={w2.shape[1]}")
    fn = _mlp_gelu(b1 is not None)
    return fn(x, w1, b1, w2, b2) if b1 is not None else fn(x, w1, w2)
