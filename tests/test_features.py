"""Feature-extraction tests (models/features.py).

Parity surface: reference models/_features.py:1-483 (FeatureInfo,
feature_take_indices, FeatureListNet) and vision_transformer.py:782-875
(forward_intermediates). The family sweep runs entirely under
jax.eval_shape — zero compiles — so it can cover 16 trunk families in the
default suite; two small families do real compute.
"""
import jax
import jax.numpy as jnp
import pytest

from vision_transformers_torch_xla_tpu.models.factory import create_model
from vision_transformers_torch_xla_tpu.models.features import (
    FeatureInfo,
    FeatureListNet,
    extract_features,
    feature_take_indices,
    forward_intermediates,
    get_feature_info,
)
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer


# --------------------------------------------------------------- ViT legacy

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


# ------------------------------------------------------ take-index semantics

def test_feature_take_indices():
    assert feature_take_indices(5) == ([0, 1, 2, 3, 4], 4)
    assert feature_take_indices(5, 2) == ([3, 4], 4)          # last-n
    assert feature_take_indices(5, [0, -1]) == ([0, 4], 4)    # negatives
    with pytest.raises(ValueError):
        feature_take_indices(4, [4])
    with pytest.raises(ValueError):
        feature_take_indices(4, 0)


def test_feature_info_accessors():
    fi = FeatureInfo([
        dict(num_chs=64, reduction=4, module="stage_0"),
        dict(num_chs=128, reduction=8, module="stage_1"),
        dict(num_chs=256, reduction=16, module="stage_2"),
    ], out_indices=(1, -1))
    assert fi.channels() == [128, 256]
    assert fi.reduction() == [8, 16]
    assert fi.module_name() == ["stage_1", "stage_2"]
    assert fi.get("num_chs", 0) == 64
    fi2 = fi.from_other(None)
    assert fi2.channels() == [64, 128, 256]
    assert len(fi) == 3


# ------------------------------------------- family sweep (eval_shape only)

# (name, img, expected taps, expected last-tap channels, last reduction)
FAMILIES = [
    ("resnet18", 224, 4, 512, 32),
    ("resnetv2_18", 224, 4, 512, 32),
    ("convnext_atto", 224, 4, 320, 32),
    ("swin_tiny_patch4_window7_224", 224, 4, 768, 32),
    ("swinv2_tiny_window8_256", 256, 4, 768, 32),
    ("poolformer_s12", 224, 4, 512, 32),
    ("efficientnet_b0", 224, 7, 320, 32),
    ("mobilenetv3_small_100", 224, 5, 576, 32),
    ("regnety_002", 224, 4, 368, 32),
    ("densenet121", 224, 4, 1024, 32),
    ("vgg11", 224, 5, 512, 16),
    ("cspresnet50", 256, 4, 1024, 32),
    ("nf_regnet_b0", 192, 4, 328, 32),
    ("maxvit_tiny_rw_224", 224, 4, 512, 32),
    ("ese_vovnet19b_dw", 224, 4, 1024, 32),
    ("pvt_v2_b0", 224, 4, 256, 32),
    ("repvgg_a0", 224, 4, 1280, 32),
]


@pytest.mark.parametrize("name,img,n_taps,last_chs,last_red",
                         FAMILIES, ids=[f[0] for f in FAMILIES])
def test_family_feature_info(name, img, n_taps, last_chs, last_red):
    """FeatureInfo for 16 trunk families, derived with zero compute."""
    m = create_model(name)
    x = jax.ShapeDtypeStruct((1, img, img, 3), jnp.float32)
    vs = jax.eval_shape(lambda xx: m.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)},
        xx, True), x)
    fi = get_feature_info(m, vs, (1, img, img, 3))
    assert len(fi) == n_taps, f"{name}: {len(fi)} taps, expected {n_taps}"
    assert fi.channels()[-1] == last_chs
    assert fi.reduction()[-1] == last_red
    reds = fi.reduction()
    assert all(a <= b for a, b in zip(reds, reds[1:])), \
        f"{name}: reductions not monotone: {reds}"
    # pyramid shapes via eval_shape extraction too
    _, feats = jax.eval_shape(
        lambda v, xx: extract_features(m, v, xx, out_indices=[-1]), vs, x)
    assert feats[0].shape[-1] == last_chs


# ------------------------------------------------------ real-compute checks

def test_extract_features_resnet_real():
    m = create_model("resnet18", num_classes=10)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    y, feats = extract_features(m, vs, x)
    assert y.shape == (1, 10)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]
    # out_indices selection
    _, sel = extract_features(m, vs, x, out_indices=(1, -1))
    assert [f.shape for f in sel] == [(1, 8, 8, 128), (1, 2, 2, 512)]


def test_features_only_factory():
    """create_model(..., features_only=True) -> FeatureListNet wrapper."""
    net = create_model("mobilenetv3_small_100", features_only=True,
                       out_indices=(-2, -1))
    assert isinstance(net, FeatureListNet)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    vs = net.init({"params": jax.random.key(0)}, x)
    feats = net.apply(vs, x)
    assert len(feats) == 2
    assert feats[0].shape[1] > feats[1].shape[1]  # increasing reduction
    fi = net.feature_info(vs, (1, 64, 64, 3))
    assert fi.channels() == [f.shape[-1] for f in feats]
