"""Pretrained / local-dir / hf-hub weight path.

Covers the reference's build_model_with_cfg/load_pretrained surface
(reference models/_builder.py:551, _factory.py:20-43, _hub.py) with
synthetic checkpoints on disk — VERDICT item 3.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.models import (
    apply_pretrained,
    create_model,
    save_local_dir,
)
from vision_transformers_torch_xla_tpu.models.pretrained import (
    flatten_tree,
    load_state_dict,
    merge_into_params,
    nest_flat,
)


def _init(model, size=64, seed=0):
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    return model.init({"params": jax.random.key(seed)}, x, False)["params"]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A saved local-dir for a small ViT with known params."""
    d = tmp_path_factory.mktemp("hub") / "vit-tiny-test"
    model = create_model("vit_tiny_patch16_224", img_size=64, num_classes=10)
    params = _init(model, seed=7)
    save_local_dir(str(d), "vit_tiny_patch16_224", params,
                   model_args=dict(img_size=64, num_classes=10))
    return str(d), params


def _trees_equal(a, b):
    fa, fb = flatten_tree(jax.tree.map(np.asarray, a)), flatten_tree(
        jax.tree.map(np.asarray, b))
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], err_msg=k)


def test_flatten_nest_roundtrip():
    tree = {"a": {"b": np.ones((2, 3)), "c": np.zeros(4)}, "d": np.arange(5)}
    assert json.dumps(sorted(flatten_tree(nest_flat(flatten_tree(tree)))),
                      default=str) == json.dumps(sorted(flatten_tree(tree)),
                                                 default=str)


def test_local_dir_roundtrip(tiny_ckpt):
    d, saved = tiny_ckpt
    model = create_model(f"local-dir:{d}")
    # model_args from config.json applied (img_size=64, num_classes=10)
    fresh = _init(model, seed=99)
    merged = apply_pretrained(model, fresh)
    _trees_equal(merged, saved)


def test_pretrained_true_with_overlay(tiny_ckpt):
    d, saved = tiny_ckpt
    model = create_model(
        "vit_tiny_patch16_224", img_size=64, num_classes=10, pretrained=True,
        pretrained_cfg_overlay=dict(file=os.path.join(d, "model.npz")))
    merged = apply_pretrained(model, _init(model, seed=3))
    _trees_equal(merged, saved)


def test_pretrained_true_without_file_raises():
    with pytest.raises(FileNotFoundError, match="no local weights"):
        create_model("vit_tiny_patch16_224", pretrained=True)


def test_hf_hub_local_cache(tiny_ckpt, monkeypatch, tmp_path):
    d, saved = tiny_ckpt
    cache = tmp_path / "hubcache"
    target = cache / "acme--vit-tiny-test"
    os.makedirs(cache, exist_ok=True)
    os.symlink(d, target)
    monkeypatch.setenv("VTX_HUB_CACHE", str(cache))
    model = create_model("hf-hub:acme/vit-tiny-test")
    merged = apply_pretrained(model, _init(model, seed=5))
    _trees_equal(merged, saved)


def test_hf_hub_missing_raises(monkeypatch, tmp_path):
    monkeypatch.setenv("VTX_HUB_CACHE", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="no network egress"):
        create_model("hf-hub:nobody/nothing")


def test_head_dropped_on_num_classes_mismatch(tiny_ckpt):
    d, _ = tiny_ckpt
    model = create_model(
        "vit_tiny_patch16_224", img_size=64, num_classes=37, pretrained=True,
        pretrained_cfg_overlay=dict(file=os.path.join(d, "model.npz")))
    fresh = _init(model, seed=11)
    merged = apply_pretrained(model, fresh)
    # head kept fresh (shape mismatch -> skipped, reference _builder.py
    # load_pretrained classifier drop), trunk loaded
    fm, ff = flatten_tree(merged), flatten_tree(fresh)
    np.testing.assert_allclose(fm["head/kernel"], ff["head/kernel"])
    loaded = flatten_tree(load_state_dict(d))
    np.testing.assert_allclose(fm["blocks_0/norm1/scale"],
                               loaded["blocks_0/norm1/scale"])


def test_pos_embed_resampled_on_img_size_change(tiny_ckpt):
    d, saved = tiny_ckpt  # trained at 64 -> grid 4x4 (+cls)
    model = create_model(
        "vit_tiny_patch16_224", img_size=96, num_classes=10, pretrained=True,
        pretrained_cfg_overlay=dict(file=os.path.join(d, "model.npz")))
    fresh = _init(model, size=96, seed=13)
    merged, n = merge_into_params(fresh, load_state_dict(d))
    assert (merged["pos_embed"].shape
            == flatten_tree(fresh)["pos_embed"].shape)  # 6*6+1
    # resample actually happened (not kept fresh): cls-token row survives
    np.testing.assert_allclose(
        np.asarray(merged["pos_embed"][0, 0]),
        flatten_tree(saved)["pos_embed"][0, 0], rtol=1e-5)
    assert n == len(flatten_tree(saved))


def test_zero_match_raises(tmp_path):
    np.savez(tmp_path / "junk.npz", **{"foo/bar": np.ones(3)})
    model = create_model(
        "vit_tiny_patch16_224", img_size=64, pretrained=True,
        pretrained_cfg_overlay=dict(file=str(tmp_path / "junk.npz")))
    with pytest.raises(ValueError, match="matched 0"):
        apply_pretrained(model, _init(model))


def test_push_to_hf_hub_local_roundtrip(monkeypatch, tmp_path):
    """push_to_hf_hub into a local fake hub (reference _hub.py:396-457),
    then load back via create_model('hf-hub:...', pretrained=True)."""
    from vision_transformers_torch_xla_tpu.models import push_to_hf_hub
    from vision_transformers_torch_xla_tpu.models.pretrained import (
        pretrained_state,
    )

    monkeypatch.setenv("VTX_HUB_CACHE", str(tmp_path))
    model = create_model("vit_tiny_patch16_224", img_size=64, num_classes=10)
    params = _init(model, seed=3)
    dest = push_to_hf_hub(
        params, "vit_tiny_patch16_224", "vtx-test/vit-tiny-push",
        model_args=dict(img_size=64, num_classes=10),
        model_card=dict(description="test push",
                        details={"Dataset": "imagenet-1k"}))
    assert os.path.isdir(dest)
    readme = open(os.path.join(dest, "README.md")).read()
    assert "image-classification" in readme and "imagenet-1k" in readme
    m2 = create_model("hf-hub:vtx-test/vit-tiny-push", pretrained=True)
    assert pretrained_state(m2) is not None
    p2 = apply_pretrained(m2, _init(m2, seed=9))
    _trees_equal(params, p2)


def test_push_to_hf_hub_no_cache_raises(monkeypatch):
    from vision_transformers_torch_xla_tpu.models import push_to_hf_hub

    monkeypatch.delenv("VTX_HUB_CACHE", raising=False)
    monkeypatch.delenv("HF_TOKEN", raising=False)
    with pytest.raises(RuntimeError, match="VTX_HUB_CACHE"):
        push_to_hf_hub({"w": np.ones((2, 2))}, "vit_tiny_patch16_224",
                       "org/repo")
