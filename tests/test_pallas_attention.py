"""Pallas attention kernel correctness (interpreter mode on CPU).

On real TPU the same kernels are exercised by tools/bench_attn.py /
tools/bench_step.py --pallas; measured numbers live in the layer docstrings.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_torch_xla_tpu.ops.attention import _reference_attention
from vision_transformers_torch_xla_tpu.ops.flash_attention import (
    fused_attention,
    fused_attention_qkv,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def test_fused_attention_fwd():
    B, H, S, D = 1, 2, 197, 64
    q, k, v = _rand((B, H, S, D), 0), _rand((B, H, S, D), 1), _rand((B, H, S, D), 2)
    ref = _reference_attention(q, k, v)
    got = fused_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_fused_attention_grads():
    B, H, S, D = 1, 1, 130, 64  # non-multiple-of-128 seq
    q, k, v = _rand((B, H, S, D), 3), _rand((B, H, S, D), 4), _rand((B, H, S, D), 5)
    g_ref = jax.grad(lambda q, k, v: (_reference_attention(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(lambda q, k, v: (fused_attention(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)


def test_fused_attention_qkv_matches_reference():
    B, H, S, D = 1, 2, 197, 64
    qkv = _rand((B, S, 3, H, D), 6)
    qt = qkv.transpose(2, 0, 3, 1, 4)
    ref = _reference_attention(qt[0], qt[1], qt[2]) \
        .transpose(0, 2, 1, 3).reshape(B, S, H * D)
    got = fused_attention_qkv(qkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_fused_attention_qkv_grads():
    B, H, S, D = 1, 2, 197, 64
    qkv = _rand((B, S, 3, H, D), 7)

    def loss_ref(qkv):
        qt = qkv.transpose(2, 0, 3, 1, 4)
        return (_reference_attention(qt[0], qt[1], qt[2]) ** 2).sum()

    g_ref = jax.grad(loss_ref)(qkv)
    g_pal = jax.grad(lambda x: (fused_attention_qkv(x) ** 2).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-2, rtol=5e-3)


def _ref_from_cols(qkv, h):
    b, s, thd = qkv.shape
    d = thd // (3 * h)
    t = qkv.reshape(b, s, 3, h, d).transpose(2, 0, 3, 1, 4)
    o = _reference_attention(t[0], t[1], t[2])
    return o.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def test_fused_attention_qkv_cols_matches_reference():
    # head-pair kernel: reads the fused qkv projection output in place
    from vision_transformers_torch_xla_tpu.ops.flash_attention import (
        fused_attention_qkv_cols,
    )
    B, H, S, D = 2, 4, 197, 64
    qkv = _rand((B, S, 3 * H * D), 3)
    ref = _ref_from_cols(qkv, H)
    got = fused_attention_qkv_cols(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_fused_attention_qkv_cols_grads():
    from vision_transformers_torch_xla_tpu.ops.flash_attention import (
        fused_attention_qkv_cols,
    )
    B, H, S, D = 1, 2, 130, 64  # ragged seq exercises the column mask
    qkv = _rand((B, S, 3 * H * D), 4)
    w = jnp.cos(jnp.arange(H * D, dtype=jnp.float32))
    g_ref = jax.grad(lambda x: jnp.sum(_ref_from_cols(x, H) * w))(qkv)
    g_got = jax.grad(
        lambda x: jnp.sum(fused_attention_qkv_cols(x, H) * w))(qkv)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=5e-3, rtol=5e-3)


def test_fused_attention_qkv_cols_rejects_odd_heads():
    from vision_transformers_torch_xla_tpu.ops.flash_attention import (
        fused_attention_qkv_cols,
    )
    with pytest.raises(ValueError):
        fused_attention_qkv_cols(_rand((1, 16, 3 * 3 * 64)), 3)


def _ref_proj_attention(x, w, b, h):
    qkv = x @ w
    if b is not None:
        qkv = qkv + b
    return _ref_from_cols(qkv, h)


@pytest.mark.parametrize("has_bias", [True, False])
def test_qkv_proj_attention_grads(has_bias):
    # projection + attention under one custom VJP: x/W/b cotangents must
    # match autodiff through the reference composite (incl. the
    # pair-interleaved dqkv column permutation folded into W)
    from vision_transformers_torch_xla_tpu.ops.flash_attention import (
        qkv_proj_attention,
    )
    B, H, S, D = 2, 2, 197, 64
    x = _rand((B, S, H * D), 11)
    w = _rand((H * D, 3 * H * D), 12) * 0.1
    b = _rand((3 * H * D,), 13) * 0.1 if has_bias else None
    cot = jnp.sin(jnp.arange(H * D, dtype=jnp.float32))

    argnums = (0, 1, 2) if has_bias else (0, 1)
    args = (x, w, b) if has_bias else (x, w)

    def loss_ref(*a):
        xx, ww = a[0], a[1]
        bb = a[2] if has_bias else None
        return jnp.sum(_ref_proj_attention(xx, ww, bb, H) * cot)

    def loss_pal(*a):
        xx, ww = a[0], a[1]
        bb = a[2] if has_bias else None
        return jnp.sum(qkv_proj_attention(xx, ww, bb, H) * cot)

    out_ref = _ref_proj_attention(x, w, b, H)
    out_pal = qkv_proj_attention(x, w, b, H)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-3, rtol=1e-3)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    g_pal = jax.grad(loss_pal, argnums=argnums)(*args)
    for a, bq in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(bq), np.asarray(a),
                                   atol=1e-2, rtol=5e-3)


def test_fused_attention_qkv_cols_long_seq_fallback():
    # S > _MAX_VMEM_SEQ routes through the blocked flash kernel
    from vision_transformers_torch_xla_tpu.ops.flash_attention import (
        fused_attention_qkv_cols,
    )
    B, H, S, D = 1, 2, 1100, 64
    qkv = _rand((B, S, 3 * H * D), 7)
    got = fused_attention_qkv_cols(qkv, H)
    ref = _ref_from_cols(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)
