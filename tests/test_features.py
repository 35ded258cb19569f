"""Feature-extraction tests (models/features.py)."""
import jax
import jax.numpy as jnp

from vision_transformers_torch_xla_tpu.models.features import forward_intermediates
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer


def test_intermediates_all_blocks(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    y, feats = forward_intermediates(m, vs, x)
    assert y.shape == (2, 10)
    assert len(feats) == m.depth
    for f in feats:
        assert f.shape == (2, 5, 64)  # (B, 4 patches + cls, C)


def test_intermediates_indices_and_reshape(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    _, feats = forward_intermediates(m, vs, x, indices=[-1], reshape=True)
    assert len(feats) == 1
    assert feats[0].shape == (2, 2, 2, 64)  # 32/16 = 2x2 grid


def test_plain_apply_unaffected(tiny_model_kwargs):
    """sow must be free when intermediates aren't mutable."""
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(vs, x, True)
    assert y.shape == (1, 10)
