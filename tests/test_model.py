"""ViT model structure tests (reference models/vision_transformer.py:444-995)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.models.vit import (
    VisionTransformer,
    resample_pos_embed,
)


@pytest.fixture(scope="module")
def tiny(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    return m, vs, x


def test_param_tree_structure(tiny):
    m, vs, _ = tiny
    p = vs["params"]
    for key in ["patch_embed", "cls_token", "pos_embed", "blocks_0",
                "blocks_1", "norm", "head"]:
        assert key in p, key
    # token pool (timm default): trunk norm active, fc_norm Identity —
    # the two are mutually exclusive (reference :564-618)
    assert "fc_norm" not in p
    # seq = (32/16)^2 + 1 cls = 5
    assert p["pos_embed"].value.shape == (1, 5, 64)
    assert p["blocks_0"]["attn"]["qkv"]["kernel"].value.shape == (64, 192)


def test_forward_shapes_and_dtype(tiny):
    m, vs, x = tiny
    y = m.apply(vs, x, True)
    assert y.shape == (2, 10)
    assert y.dtype == jnp.float32


def test_pool_modes(tiny_model_kwargs):
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    for pool in ["avg", "token", "map"]:
        m = VisionTransformer(**tiny_model_kwargs, global_pool=pool,
                              dtype=jnp.float32)
        vs = m.init({"params": jax.random.key(0)}, x, True)
        assert m.apply(vs, x, True).shape == (2, 10), pool


def test_droppath_stochastic(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, drop_path_rate=0.5,
                          dtype=jnp.float32)
    x = jnp.ones((4, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    y1 = m.apply(vs, x, False, rngs={"dropout": jax.random.key(1),
                                     "droppath": jax.random.key(2)})
    y2 = m.apply(vs, x, False, rngs={"dropout": jax.random.key(1),
                                     "droppath": jax.random.key(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    # deterministic mode is reproducible
    y3 = m.apply(vs, x, True)
    y4 = m.apply(vs, x, True)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y4))


def test_layerscale_params(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, init_values=1e-5, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    g = vs["params"]["blocks_0"]["ls1"]["gamma"].value
    np.testing.assert_allclose(np.asarray(g), 1e-5)


def test_resample_pos_embed():
    pe = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 8)), jnp.float32)
    out = resample_pos_embed(pe, new_grid=(4, 4), old_grid=(2, 2),
                             num_prefix_tokens=1)
    assert out.shape == (1, 17, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))


def test_reg_tokens(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, reg_tokens=2, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    assert vs["params"]["pos_embed"].value.shape == (1, 4 + 3, 64)
    assert m.apply(vs, x, True).shape == (1, 10)


def test_attn_drop_applied_in_train_mode():
    """--attn_drop_rate reaches the softmax probs (ADVICE r1: was inert)."""
    import numpy as np

    from vision_transformers_torch_xla_tpu.models.layers import Attention

    attn = Attention(num_heads=2, attn_drop=0.5, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 8, 32))
    v = attn.init({"params": jax.random.key(1)}, x, True)
    det = attn.apply(v, x, True)
    d1 = attn.apply(v, x, False, rngs={"dropout": jax.random.key(2)})
    d2 = attn.apply(v, x, False, rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(det, d1)   # active in train mode
    assert not np.allclose(d1, d2)    # rng-dependent
    np.testing.assert_allclose(det, attn.apply(v, x, True))  # eval unchanged


def test_block_variants_forward_and_grads():
    """ResPost/ParallelScaling/ParallelThings blocks (reference
    vision_transformer.py:181,242,344)."""
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    for bt in ("respost", "parallel_scaling", "parallel_things"):
        m = VisionTransformer(img_size=32, patch_size=16, embed_dim=64,
                              depth=2, num_heads=2, num_classes=10,
                              block_type=bt, drop_path_rate=0.1,
                              dtype=jnp.float32)
        vs = m.init({"params": jax.random.key(0)}, x, True)
        y = m.apply(vs, x, False, rngs={"dropout": jax.random.key(1),
                                        "droppath": jax.random.key(2)})
        assert y.shape == (2, 10), bt
        g = jax.grad(lambda p: m.apply({"params": p}, x, True).sum())(
            vs["params"])
        assert all(jnp.isfinite(l).all() for l in jax.tree.leaves(g)), bt


def test_dynamic_img_size_and_set_input_size():
    """Runtime pos-embed resample (reference :748-756) + set_input_size
    (:718): params from 32px init run at 48px."""
    m = VisionTransformer(img_size=32, patch_size=16, embed_dim=64, depth=1,
                          num_heads=2, num_classes=10, dynamic_img_size=True,
                          dtype=jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, jnp.ones((1, 32, 32, 3)), True)
    assert m.apply(vs, jnp.ones((1, 48, 48, 3)), True).shape == (1, 10)
    m48 = m.set_input_size(48)
    assert m48.apply(vs, jnp.ones((1, 48, 48, 3)), True).shape == (1, 10)
    # static models still reject mismatched inputs loudly
    m_static = VisionTransformer(img_size=32, patch_size=16, embed_dim=64,
                                 depth=1, num_heads=2, num_classes=10,
                                 dtype=jnp.float32)
    vss = m_static.init({"params": jax.random.key(0)},
                        jnp.ones((1, 32, 32, 3)), True)
    with pytest.raises(ValueError, match="dynamic_img_size"):
        m_static.apply(vss, jnp.ones((1, 48, 48, 3)), True)


def test_patch_dropout():
    """PatchDropout (reference :572-578): train-mode only, prefix kept."""
    m = VisionTransformer(img_size=32, patch_size=8, embed_dim=64, depth=1,
                          num_heads=2, num_classes=10, patch_drop_rate=0.5,
                          dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    _, inter = m.apply(vs, x, False, rngs={"dropout": jax.random.key(1)},
                       mutable=["intermediates"])
    tokens = jax.tree.leaves(inter["intermediates"])[0]
    assert tokens.shape[1] == 1 + 8  # cls + 50% of 16 patches
    _, inter = m.apply(vs, x, True, mutable=["intermediates"])
    tokens = jax.tree.leaves(inter["intermediates"])[0]
    assert tokens.shape[1] == 1 + 16  # eval: all tokens
