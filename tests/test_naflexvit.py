"""NaFlexVit: variable-resolution ViT (reference models/naflexvit.py).

Covers what the zoo family forward can't: the NaFlex token path
(pre-patchified buffers + coords + validity masks), padding invariance,
equivalence of the masked path with the standard 2D path on identical
pixels, and the closed-form pos-embed sampler against torch's actual
affine_grid + grid_sample composition (the reference's
pos_embed_use_grid_sample path, naflexvit.py:482-526).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.models import factory, registry
from vision_transformers_torch_xla_tpu.models.naflexvit import (
    NaFlexVit,
    _sample_2d,
    _grid_pos,
    batch_patchify,
)

P = 16


def _tiny(name="naflexvit_base_patch16_gap", **kw):
    kw.setdefault("embed_dim", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("num_classes", 10)
    kw.setdefault("img_size", 64)
    kw.setdefault("dtype", jnp.float32)
    return factory.create_model(name, **kw)


def _patchify_np(img, n_max):
    """[H, W, 3] -> padded (patches, coord, valid) in reference layout
    (ph, pw, C) channel order (reference naflexvit.py:148-177)."""
    h, w, _ = img.shape
    nh, nw = h // P, w // P
    pt = img[:nh * P, :nw * P].reshape(nh, P, nw, P, 3)
    pt = pt.transpose(0, 2, 1, 3, 4).reshape(nh * nw, P * P * 3)
    n = nh * nw
    assert n <= n_max
    buf = np.zeros((n_max, P * P * 3), np.float32)
    buf[:n] = pt
    yy, xx = np.meshgrid(np.arange(nh), np.arange(nw), indexing="ij")
    coord = np.zeros((n_max, 2), np.int32)
    coord[:n, 0] = yy.ravel()
    coord[:n, 1] = xx.ravel()
    valid = np.zeros(n_max, bool)
    valid[:n] = True
    return buf, coord, valid


def _naflex_batch(imgs, n_max):
    parts = [_patchify_np(im, n_max) for im in imgs]
    return (jnp.stack([p[0] for p in parts]),
            jnp.stack([p[1] for p in parts]),
            jnp.stack([p[2] for p in parts]))


def test_all_entrypoints_registered():
    names = [n for n in registry.list_models() if n.startswith("naflexvit_")]
    assert sorted(names) == [
        "naflexvit_base_patch16_gap", "naflexvit_base_patch16_map",
        "naflexvit_base_patch16_par_gap", "naflexvit_base_patch16_parfac_gap",
        "naflexvit_base_patch16_siglip",
        "naflexvit_so150m2_patch16_reg1_gap",
        "naflexvit_so150m2_patch16_reg1_map",
        "naflexvit_so400m_patch16_siglip"]


@pytest.mark.parametrize("name", [
    "naflexvit_base_patch16_gap",       # masked avg pool, reg tokens
    "naflexvit_base_patch16_map",       # masked MAP pool
    "naflexvit_base_patch16_par_gap",   # aspect-preserving pos embed
    "naflexvit_base_patch16_parfac_gap",  # factorized pos embed
])
def test_padding_invariance(name):
    """Extending the padded buffer must not change any logits — the mask
    discipline (attention + pooling) is airtight iff this is exact."""
    m = _tiny(name)
    rng = np.random.RandomState(0)
    imgs = [rng.rand(64, 48, 3).astype(np.float32),
            rng.rand(32, 80, 3).astype(np.float32)]
    vs = m.init({"params": jax.random.key(0)},
                jnp.ones((2, 64, 64, 3), jnp.float32), True)
    pa, ca, va = _naflex_batch(imgs, 16)
    pb, cb, vb = _naflex_batch(imgs, 40)
    ya = m.apply(vs, pa, True, patch_coord=ca, patch_valid=va)
    yb = m.apply(vs, pb, True, patch_coord=cb, patch_valid=vb)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)


def test_naflex_matches_standard_mode():
    """A full-grid NaFlex batch (no padding) must equal the standard
    image path bit-for-bit: same patchify, same pos-embed positions."""
    m = _tiny()
    rng = np.random.RandomState(1)
    img = rng.rand(64, 64, 3).astype(np.float32)
    x_img = jnp.asarray(img)[None]
    vs = m.init({"params": jax.random.key(0)}, x_img, True)
    y_std = m.apply(vs, x_img, True)
    pt, coord, valid = _naflex_batch([img], 16)
    y_nf = m.apply(vs, pt, True, patch_coord=coord, patch_valid=valid)
    np.testing.assert_allclose(np.asarray(y_std), np.asarray(y_nf),
                               rtol=1e-5, atol=1e-5)


def test_pos_embed_sampler_matches_torch_grid_sample():
    """_sample_2d + _grid_pos == the reference's affine_grid+grid_sample
    composition (naflexvit.py:496-526), checked against torch itself."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    h0, w0, c = 7, 5, 8
    rng = np.random.RandomState(2)
    table = rng.randn(h0, w0, c).astype(np.float32)
    h_i, w_i = 3, 9            # per-sample grid
    yy, xx = np.meshgrid(np.arange(h_i), np.arange(w_i), indexing="ij")
    coord = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.int32)

    # torch reference: reproduce naflexvit.py:510-526 exactly
    gy, gx = h_i, w_i          # grid_size = shapes.amax(0) for B=1
    theta = torch.zeros(1, 2, 3)
    theta[:, 0, 0] = gx / w_i
    theta[:, 1, 1] = gy / h_i
    theta[:, 0, 2] = gx / w_i - 1
    theta[:, 1, 2] = gy / h_i - 1
    grid = F.affine_grid(theta, (1, c, gy, gx), align_corners=False)
    pe = F.grid_sample(
        torch.from_numpy(table).permute(2, 0, 1)[None].float(), grid,
        mode="bilinear", align_corners=False, padding_mode="border")
    want = pe[0, :, coord[:, 0], coord[:, 1]].T.numpy()

    grid_hw = jnp.asarray([[h_i, w_i]], jnp.float32)
    ypos = _grid_pos(jnp.asarray(coord[None, :, 0]), grid_hw[:, 0:1], h0)
    xpos = _grid_pos(jnp.asarray(coord[None, :, 1]), grid_hw[:, 1:2], w0)
    got = np.asarray(_sample_2d(jnp.asarray(table), ypos, xpos))[0]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ar_preserving_uses_max_side():
    """par variants scale both axes by max(h, w) (naflexvit.py:500-504):
    a square pos-embed lookup at (y, x) and its transpose at (x, y) must
    agree for a symmetric table."""
    m = _tiny("naflexvit_base_patch16_par_gap", depth=1)
    rng = np.random.RandomState(3)
    img = rng.rand(32, 64, 3).astype(np.float32)
    vs = m.init({"params": jax.random.key(0)},
                jnp.ones((1, 64, 64, 3), jnp.float32), True)
    pt, coord, valid = _naflex_batch([img], 8)
    y = m.apply(vs, pt, True, patch_coord=coord, patch_valid=valid)
    assert np.isfinite(np.asarray(y)).all()


def test_masked_map_pool_ignores_padding():
    """MAP pooling with a validity mask: flipping PIXELS inside padding
    slots must not leak into the pooled logits."""
    m = _tiny("naflexvit_base_patch16_map")
    rng = np.random.RandomState(4)
    img = rng.rand(48, 48, 3).astype(np.float32)
    vs = m.init({"params": jax.random.key(0)},
                jnp.ones((1, 64, 64, 3), jnp.float32), True)
    pt, coord, valid = _naflex_batch([img], 16)
    y1 = m.apply(vs, pt, True, patch_coord=coord, patch_valid=valid)
    poisoned = np.asarray(pt).copy()
    poisoned[0, 9:] = 1e3      # garbage in every padding slot
    y2 = m.apply(vs, jnp.asarray(poisoned), True, patch_coord=coord,
                 patch_valid=valid)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def test_use_naflex_delegation():
    """Classic vit_* names route through NaFlexVit via use_naflex=True
    (reference vision_transformer.py:2655-2664) or the env default."""
    m = factory.create_model("vit_base_patch16_224", use_naflex=True,
                             embed_dim=64, depth=1, num_heads=2,
                             num_classes=10, img_size=64)
    assert isinstance(m, NaFlexVit)
    assert m.class_token and m.global_pool == "token"
    assert m.pos_embed_grid_size == (4, 4)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    assert m.apply(vs, x, True).shape == (1, 10)

    import os

    os.environ["VTX_USE_NAFLEXVIT"] = "true"
    try:
        m2 = factory.create_model("vit_small_patch16_224", embed_dim=64,
                                  depth=1, num_heads=2, img_size=64)
        assert isinstance(m2, NaFlexVit)
    finally:
        del os.environ["VTX_USE_NAFLEXVIT"]
    m3 = factory.create_model("vit_small_patch16_224", embed_dim=64,
                              depth=1, num_heads=2, img_size=64)
    assert not isinstance(m3, NaFlexVit)


def test_train_step_grads():
    """One SGD step through the NaFlex path: finite loss, nonzero grads
    on pos embed + blocks, dropout/droppath rngs wired."""
    m = _tiny(drop_path_rate=0.1, pos_drop_rate=0.1)
    rng = np.random.RandomState(5)
    imgs = [rng.rand(64, 48, 3).astype(np.float32),
            rng.rand(48, 64, 3).astype(np.float32)]
    pt, coord, valid = _naflex_batch(imgs, 16)
    labels = jnp.asarray([1, 7])
    vs = m.init({"params": jax.random.key(0)},
                jnp.ones((2, 64, 64, 3), jnp.float32), True)

    def loss_fn(params):
        logits = m.apply(
            {"params": params}, pt, False, patch_coord=coord,
            patch_valid=valid,
            rngs={"dropout": jax.random.key(1),
                  "droppath": jax.random.key(2)})
        oh = jax.nn.one_hot(labels, 10)
        return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

    from flax import linen as nn

    loss, grads = jax.value_and_grad(loss_fn)(nn.meta.unbox(vs["params"]))
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    pe = grads["pos_embed"]
    assert float(jnp.abs(pe).sum()) > 0


def test_batch_patchify_layout():
    """Patch feature order is (ph, pw, C) — torch-checkpoint compatible
    (reference naflexvit.py:174 permute comment)."""
    x = jnp.arange(1 * 32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3)
    pt, (nh, nw) = batch_patchify(x, (16, 16))
    assert pt.shape == (1, 4, 16 * 16 * 3) and (nh, nw) == (2, 2)
    # token 0 = top-left patch, row-major within the patch, C fastest
    want = np.asarray(x[0, :16, :16]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(pt[0, 0]), want)


def test_so150m2_mlp_ratio():
    """Odd-ratio hidden dims follow int(dim * ratio) (reference
    naflexvit.py:1722-1734: 832 * 34/13 = 2176)."""
    m = factory.create_model("naflexvit_so150m2_patch16_reg1_gap")
    assert int(m.embed_dim * m.mlp_ratio) == 2176
    assert m.qkv_bias is False and m.reg_tokens == 1
