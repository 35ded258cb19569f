"""scan_blocks (lax.scan over layers) tests."""
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.train.optim import scale_by_layer_decay


def test_scan_param_stacking(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, scan_blocks=True, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    qkv = vs["params"]["blocks_stacked"]["block"]["attn"]["qkv"]["kernel"]
    assert qkv.value.shape == (2, 64, 192)          # (layers, in, out)
    assert qkv.names == ("layers", "embed", "qkv_out")
    y = m.apply(vs, x, True)
    assert y.shape == (1, 10)


def test_scan_matches_loop_param_count(tiny_model_kwargs):
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    loop = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    scan = VisionTransformer(**tiny_model_kwargs, scan_blocks=True, dtype=jnp.float32)
    n_loop = sum(p.size for p in jax.tree.leaves(
        loop.init({"params": jax.random.key(0)}, x, True)))
    n_scan = sum(p.size for p in jax.tree.leaves(
        scan.init({"params": jax.random.key(0)}, x, True)))
    assert n_loop == n_scan


def test_scan_grads_flow(tiny_model_kwargs):
    m = VisionTransformer(**tiny_model_kwargs, scan_blocks=True,
                          drop_path_rate=0.1, dtype=jnp.float32)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    g = jax.grad(lambda p: (m.apply({"params": p}, x, True) ** 2).sum())(vs["params"])
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_layer_decay_on_stacked():
    params = {"blocks_stacked": {"block": {"attn": {"qkv": {
        "kernel": jnp.ones((4, 8, 24))}}}},
        "head": {"kernel": jnp.ones((8, 10))}}
    tx = scale_by_layer_decay(0.5, depth=4)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    u = np.asarray(updates["blocks_stacked"]["block"]["attn"]["qkv"]["kernel"])
    # layer ids 1..4, num_layers=6 -> scales 0.5^(5-1..5-4)
    np.testing.assert_allclose(u[:, 0, 0], [0.5 ** 4, 0.5 ** 3, 0.5 ** 2, 0.5])
    assert float(np.asarray(updates["head"]["kernel"])[0, 0]) == 1.0
