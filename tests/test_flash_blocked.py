"""Blocked flash attention correctness (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vision_transformers_torch_xla_tpu.ops.attention import _reference_attention
from vision_transformers_torch_xla_tpu.ops.flash_blocked import flash_attention_blocked


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def test_blocked_fwd_matches_reference():
    B, H, S, D = 1, 2, 300, 64  # spans 2 q blocks after padding to 512
    q, k, v = _rand((B, H, S, D), 0), _rand((B, H, S, D), 1), _rand((B, H, S, D), 2)
    ref = _reference_attention(q, k, v)
    got = flash_attention_blocked(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_blocked_fwd_multiblock_k():
    B, H, S, D = 1, 1, 512, 64  # exactly 2 K blocks, no padding
    q, k, v = _rand((B, H, S, D), 3), _rand((B, H, S, D), 4), _rand((B, H, S, D), 5)
    ref = _reference_attention(q, k, v)
    got = flash_attention_blocked(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


def test_blocked_grads_match():
    B, H, S, D = 1, 1, 300, 64
    q, k, v = _rand((B, H, S, D), 6), _rand((B, H, S, D), 7), _rand((B, H, S, D), 8)
    g_ref = jax.grad(lambda q, k, v: (_reference_attention(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(lambda q, k, v: (flash_attention_blocked(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)


def test_blocked_grads_multiblock():
    # 2 Q blocks x 2 K blocks: exercises both scratch accumulators across
    # their full grid iteration (dk/dv over Q, dq over K)
    B, H, S, D = 1, 1, 512, 64
    q, k, v = _rand((B, H, S, D), 9), _rand((B, H, S, D), 10), _rand((B, H, S, D), 11)
    g_ref = jax.grad(lambda q, k, v: (_reference_attention(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(lambda q, k, v: (flash_attention_blocked(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)
