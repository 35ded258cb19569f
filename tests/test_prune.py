"""Channel pruning (reference models/_prune.py:116 adapt_model_from_string)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.models import create_model
from vision_transformers_torch_xla_tpu.models.prune import (
    adapt_model_from_string,
    prune_model,
    prune_vit_mlp,
)
from vision_transformers_torch_xla_tpu.models.pretrained import flatten_tree


def _make(depth=2, **kw):
    m = create_model("vit_tiny_patch16_224", img_size=32, num_classes=10,
                     depth=depth, dtype=jnp.float32, **kw)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    params = m.init({"params": jax.random.key(0)}, x, False)["params"]
    return m, params, x


def test_keep_all_is_identity():
    m, params, x = _make()
    pm, pp = prune_model(m, params, keep=1.0)
    y0 = m.apply({"params": params}, x, False)
    y1 = pm.apply({"params": pp}, x, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_half_prune_shrinks_and_runs():
    m, params, x = _make()
    pm, pp = prune_model(m, params, keep=0.5)
    flat = flatten_tree(pp)
    full = 192 * 4
    assert flat["blocks_0/mlp/fc1/kernel"].shape == (192, full // 2)
    assert flat["blocks_0/mlp/fc2/kernel"].shape == (full // 2, 192)
    y = pm.apply({"params": pp}, x, False)
    assert y.shape == (2, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_prunes_low_magnitude_units():
    m, params, x = _make(depth=1)
    flat = flatten_tree(params)
    k1 = flat["blocks_0/mlp/fc1/kernel"].copy()
    k1[:, :8] = 0.0  # make first 8 hidden units worthless
    flat["blocks_0/mlp/fc1/kernel"] = k1
    from vision_transformers_torch_xla_tpu.models.pretrained import nest_flat

    _, hiddens = prune_vit_mlp(nest_flat(flat), keep=0.9)
    pruned_params, _ = prune_vit_mlp(nest_flat(flat), keep=0.9)
    pk1 = flatten_tree(pruned_params)["blocks_0/mlp/fc1/kernel"]
    # the zeroed columns are gone
    col_norms = np.linalg.norm(pk1, axis=0)
    assert (col_norms > 0).all()
    assert hiddens[0] < 192 * 4


def test_spec_string_forms():
    m, params, x = _make()
    pm, pp = adapt_model_from_string(m, params, "keep=0.75")
    assert pm.mlp_hidden == (576, 576)
    pm2, pp2 = adapt_model_from_string(m, params, "512,256")
    assert pm2.mlp_hidden == (512, 256)
    flat = flatten_tree(pp2)
    assert flat["blocks_1/mlp/fc1/kernel"].shape == (192, 256)
    y = pm2.apply({"params": pp2}, x, False)
    assert y.shape == (2, 10)


def test_scan_mode_rejected():
    m, params, _ = _make()
    pm, pp = prune_model(m, params, keep=0.5)
    bad = pm.clone(scan_blocks=True)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="loop mode"):
        bad.init({"params": jax.random.key(0)}, x, False)
