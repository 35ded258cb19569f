"""One-forward-per-family zoo coverage (small inputs keep CPU compiles fast).

Each family forward is also pinned against a golden-logits snapshot
(tests/golden_logits.json — VERDICT r3 task 4b): deterministic weights +
input, full 10-class logits stored fp64, so a refactor that silently
changes any family's semantics (stride placement, pool position, norm
site, activation) fails the comparison. Regenerate after an INTENDED
semantic change with:

    VTX_WRITE_GOLDEN_LOGITS=1 python -m pytest tests/test_model_zoo.py --full-zoo
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vision_transformers_torch_xla_tpu import create_model, list_models

GOLDEN_LOGITS_PATH = os.path.join(os.path.dirname(__file__),
                                  "golden_logits.json")

# (name, kwargs, input hw)
FAMILIES = [
    ("my_vit_ti", dict(img_size=32), 32),
    ("convnext_atto", dict(), 64),
    ("mixer_s32_224", dict(img_size=32), 32),
    ("deit_tiny_patch16_224", dict(img_size=32), 32),
    ("efficientnet_b0", dict(), 64),
    ("cait_xxs24_224", dict(img_size=32, embed_dim=64, depth=1,
                            depth_token_only=1, num_heads=2), 32),
    ("pvt_v2_b0", dict(depths=(1, 1, 1, 1)), 64),
    ("beit_base_patch16_224", dict(img_size=32, embed_dim=64, depth=1,
                                   num_heads=2), 32),
    ("xcit_nano_12_p16_224", dict(img_size=32, embed_dim=64, depth=1,
                                  cls_attn_layers=1, num_heads=2), 32),
    ("regnety_004", dict(depth=6), 64),
    ("maxvit_tiny_rw_224", dict(depths=(1, 1, 1, 1),
                                embed_dim=(32, 64, 96, 128),
                                stem_width=(16, 24)), 64),
    ("swinv2_tiny_window8_256", dict(img_size=64, window_size=4,
                                     depths=(1, 1, 1, 1)), 64),
    ("swinv2_cr_small_ns_224", dict(img_size=64, window_size=4,
                                    depths=(1, 1, 1, 1)), 64),
    ("eva02_tiny_patch14_224", dict(img_size=56, embed_dim=64, depth=2,
                                    num_heads=2), 56),
    ("eva_giant_patch14_224", dict(img_size=56, embed_dim=64, depth=2,
                                   num_heads=2), 56),
    ("vit_medium_patch16_rope_reg1_gap_256",
     dict(img_size=64, embed_dim=64, depth=2, num_heads=2), 64),
    # NaFlexVit (reference models/naflexvit.py): masked-avg + MAP pool
    # variants; standard-image path here, NaFlex token path in
    # tests/test_naflexvit.py
    ("naflexvit_base_patch16_gap",
     dict(img_size=64, embed_dim=64, depth=2, num_heads=2), 64),
    ("naflexvit_base_patch16_map",
     dict(img_size=64, embed_dim=64, depth=2, num_heads=2), 64),
    ("naflexvit_base_patch16_parfac_gap",
     dict(img_size=64, embed_dim=64, depth=2, num_heads=2), 64),
    # metaformer family: v1 (pool/GroupNorm1/LayerScale), v2 StarReLU
    # variants incl. the sep+attn caformer path with ResScale + MlpHead
    ("poolformer_s12", dict(depths=(1, 1, 1, 1),
                            dims=(16, 32, 48, 64)), 64),
    ("poolformerv2_s12", dict(depths=(1, 1, 1, 1),
                              dims=(16, 32, 48, 64)), 64),
    ("caformer_s18", dict(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128)), 64),
    ("nfnet_f0", dict(depths=(1, 1, 1, 1)), 64),
    ("eca_nfnet_l0", dict(depths=(1, 1, 1, 1)), 64),
    ("nf_seresnet26", dict(depths=(1, 1, 1, 1)), 64),
    # round-2 families (reference levit/tiny_vit/hiera/mvitv2/davit/twins/
    # gcvit/nest/coat/volo/efficientformer/focalnet .py registry surfaces)
    ("levit_128s", dict(depths=(1, 1, 1)), 64),
    ("tiny_vit_5m_224", dict(depths=(1, 1, 1, 1), img_size=64,
                             window_sizes=(2, 2, 4, 2)), 64),
    ("hiera_tiny_224", dict(depths=(1, 1, 1, 1), img_size=64), 64),
    ("mvitv2_tiny", dict(depths=(1, 1, 1, 1), img_size=64), 64),
    ("davit_tiny", dict(depths=(1, 1, 1, 1)), 64),
    ("twins_pcpvt_small", dict(depths=(1, 1, 1, 1)), 64),
    ("gcvit_xxtiny", dict(depths=(1, 1, 1, 1), img_size=64,
                          window_sizes=(4, 4, 2, 2)), 64),
    ("nest_tiny", dict(depths=(1, 1, 1), img_size=96), 96),
    ("coat_tiny", dict(depths=(1, 1, 1, 1), parallel_depth=2,
                       embed_dims=(32, 32, 32, 32), img_size=64), 64),
    ("volo_d1_224", dict(depths=(1, 1), embed_dims=(64, 128),
                         num_heads=(2, 4), img_size=64), 64),
    ("efficientformer_l1", dict(depths=(1, 1, 1, 1), vit_num=1), 64),
    ("focalnet_tiny_srf", dict(depths=(1, 1, 1, 1)), 64),
    ("convit_tiny", dict(depth=2, local_up_to_layer=1, img_size=64,
                         embed_dim=16), 64),
    ("pit_ti_224", dict(depths=(1, 1, 1), img_size=64), 64),
    ("mobilevit_xxs", dict(), 64),
    ("vgg11_bn", dict(), 64),
    ("edgenext_xx_small", dict(depths=(1, 1, 1, 1)), 64),
    ("ghostnetv2_100", dict(), 64),
    ("repghostnet_050", dict(), 64),
    ("hardcorenas_a", dict(), 64),
    ("legacy_seresnet50", dict(layers=(1, 1, 1, 1)), 64),
    ("legacy_senet154", dict(layers=(1, 1, 1, 1)), 64),
    ("visformer_tiny", dict(depths=(1, 1, 1)), 64),
    ("swiftformer_xs", dict(layers=(2, 2, 2, 2)), 64),
    ("fastvit_t8", dict(layers=(1, 1, 1, 1)), 64),
    ("repvit_m0_9", dict(depth=(1, 1, 1, 1)), 64),
    ("efficientvit_m0", dict(depth=(1, 1, 1), img_size=64), 64),
    ("resnet18d", dict(stage_sizes=(1, 1, 1, 1)), 64),
    ("res2net50_26w_4s", dict(stage_sizes=(1, 1, 1, 1)), 64),
    ("starnet_s050", dict(), 64),
    ("rexnet_100", dict(depth_mult=0.34), 64),
    ("inception_next_atto", dict(depths=(1, 1, 1, 1)), 64),
    ("mambaout_femto", dict(depths=(1, 1, 1, 1)), 64),
    ("nextvit_small", dict(depths=(1, 1, 5, 1)), 64),
    ("cspresnet50", dict(depths=(1, 1, 1, 1)), 64),
    ("resnetv2_50x1_bit", dict(layers=(1, 1, 1, 1)), 64),
    ("sequencer2d_s", dict(layers=(1, 1, 1, 1), embed_dims=(48, 96, 96, 96),
                           hidden_sizes=(12, 24, 24, 24)), 56),
    ("resnetv2_50", dict(layers=(1, 1, 1, 1)), 64),
    ("dpn68b", dict(k_sec=(1, 1, 1, 1)), 64),
    ("tresnet_m", dict(layers=(1, 1, 1, 1)), 64),
    ("dla46_c", dict(), 64),
    ("skresnet18", dict(layers=(1, 1, 1, 1)), 64),
    ("hgnet_tiny", dict(), 64),
    ("selecsls42b", dict(), 64),
    ("samvit_base_patch16", dict(img_size=64, embed_dim=64, depth=2,
                                 num_heads=2, window_size=2,
                                 global_attn_indexes=(1,)), 64),
    ("vit_relpos_small_patch16_224", dict(img_size=64, embed_dim=64,
                                          depth=2, num_heads=2), 64),
    ("vit_srelpos_small_patch16_224", dict(img_size=64, embed_dim=64,
                                           depth=2, num_heads=2), 64),
    ("vit_relpos_base_patch16_cls_224", dict(img_size=64, embed_dim=64,
                                             depth=2, num_heads=2), 64),
    ("hgnetv2_b0", dict(), 64),
    ("skresnext50_32x4d", dict(layers=(1, 1, 1, 1)), 64),
    ("tresnet_v2_l", dict(layers=(1, 1, 1, 1)), 64),
    ("cspdarknet53", dict(depths=(1, 1, 1, 1, 1)), 64),
    ("darknet53", dict(depths=(1, 1, 1, 1, 1)), 64),
    ("efficientformerv2_s0", dict(depths=(1, 1, 2, 2), num_vit=1,
                                  mlp_ratios=(4, 4, (3, 4), (3, 4))), 64),
    ("fasternet_t0", dict(depths=(1, 1, 1, 1)), 64),
    ("ese_vovnet19b_dw", dict(layer_per_block=1), 64),
    ("shvit_s1", dict(depth=(1, 1, 1)), 64),
    ("resnest50d", dict(stage_sizes=(1, 1, 1, 1)), 64),
    ("seresnext50_32x4d", dict(stage_sizes=(1, 1, 1, 1)), 64),
    ("ecaresnet50d", dict(stage_sizes=(1, 1, 1, 1)), 64),
    ("fastvit_sa12", dict(layers=(1, 1, 1, 1)), 64),
    ("densenet121", dict(block_config=(1, 1, 1, 1)), 64),
    ("inception_v3", dict(), 96),
    ("inception_v4", dict(), 96),
    ("inception_resnet_v2", dict(), 96),
    ("xception", dict(middle_blocks=1), 96),
    ("xception41", dict(), 96),
    ("rdnet_tiny", dict(num_blocks_list=(1,) * 7), 64),
    ("mobilevitv2_050", dict(), 64),
    ("tnt_s_patch16_224", dict(depth=2, img_size=64, embed_dim=64,
                               inner_dim=16, num_heads_outer=2), 64),
    ("crossvit_tiny_240", dict(depths=((1, 1, 0),), img_size=48,
                               embed_dim=(48, 96)), 48),
    ("crossvit_9_dagger_240", dict(depths=((1, 1, 0),), img_size=48,
                                   embed_dim=(32, 64),
                                   num_heads=(2, 2)), 48),
    ("pit_s_distilled_224", dict(depths=(1, 1, 1), img_size=64), 64),
    ("focalnet_large_fl3", dict(depths=(1, 1, 1, 1), embed_dim=32), 64),
    # round-3: effnet_builder block types (mixconv / condconv / er+cn /
    # uir+mqa / msfa head)
    ("mixnet_s", dict(), 64),
    ("efficientnet_cc_b0_4e", dict(), 64),
    ("tf_efficientnetv2_b0", dict(), 64),
    ("mobilenetv4_hybrid_medium", dict(), 64),
    ("mobilenetv5_base", dict(img_size=128), 128),
    # byobnet/byoanet config system (reference byobnet.py/byoanet.py)
    ("test_byobnet", dict(), 64),
    ("repvgg_a0", dict(depths=(1, 1, 1, 1)), 64),
    ("mobileone_s0", dict(depths=(2, 2, 2, 2)), 64),
    ("regnetz_c16_evos", dict(depths=(1, 1, 1, 1)), 64),
    ("halonet26t", dict(depths=(1, 1, 2, 1)), 64),
    ("lambda_resnet26t", dict(depths=(1, 1, 2, 1)), 64),
    ("botnet26t_256", dict(depths=(1, 1, 2, 1)), 64),
    ("resnet50_clip", dict(depths=(1, 1, 1, 1)), 64),
]


# Default-suite subset: one representative per broad architecture class
# (plain ViT, windowed, conv-stage, hybrid, NF, token-mix, BN-heavy,
# attention-conv). The rest compile only under --full-zoo — structural
# breadth is covered by the eval_shape audit over ALL registered names in
# tests/test_param_audit.py, which needs no compiles.
CORE = {
    "my_vit_ti", "convnext_atto", "mixer_s32_224",
    "cait_xxs24_224", "xcit_nano_12_p16_224",
    "swinv2_tiny_window8_256", "eva02_tiny_patch14_224", "nfnet_f0",
    "hiera_tiny_224", "volo_d1_224", "poolformer_s12", "caformer_s18",
    "resnet18d", "cspresnet50", "tresnet_m",
    "hgnetv2_b0", "repvgg_a0", "halonet26t", "tf_efficientnetv2_b0",
    "vit_medium_patch16_rope_reg1_gap_256",
    "naflexvit_base_patch16_gap",
    # (naflexvit map + parfac variants ride --full-zoo; the gap one covers
    # the masked-pool + coordinate pos-embed code in the default suite)
    # dropped from the default set (slowest single-core compiles, classes
    # still covered: effnet builder by tf_efficientnetv2_b0, windowed by
    # swinv2, conv-attn hybrids by halonet/volo, token-mix by mixer):
    # efficientnet_b0, maxvit_tiny_rw_224, levit_128s, mobilevit_xxs,
    # sequencer2d_s, mobilenetv4_hybrid_medium -> full_zoo
}

_PARAMS = [
    f if f[0] in CORE else pytest.param(*f, marks=pytest.mark.full_zoo)
    for f in FAMILIES
]


def _load_golden_logits():
    if not os.path.exists(GOLDEN_LOGITS_PATH):
        return {}
    with open(GOLDEN_LOGITS_PATH) as f:
        return json.load(f)


def _check_golden_logits(name, y):
    """Pin family logits to the recorded snapshot (or record them).

    rtol 1e-3 absorbs legitimate fp reassociation across XLA versions;
    a semantic change moves logits wholesale, far beyond it.
    """
    got = np.asarray(y[0], np.float64)
    if os.environ.get("VTX_WRITE_GOLDEN_LOGITS"):
        golden = _load_golden_logits()
        golden[name] = [float(v) for v in got]
        with open(GOLDEN_LOGITS_PATH, "w") as f:
            json.dump(golden, f, indent=0, sort_keys=True)
        return
    golden = _load_golden_logits()
    if name not in golden:
        return  # not yet recorded (new family) — param/shape audits still apply
    want = np.asarray(golden[name], np.float64)
    scale = max(1e-6, float(np.abs(want).max()))
    np.testing.assert_allclose(
        got, want, rtol=1e-3, atol=1e-3 * scale,
        err_msg=f"{name}: logits drifted from tests/golden_logits.json — "
                f"if the semantic change is intended, regenerate with "
                f"VTX_WRITE_GOLDEN_LOGITS=1")


@pytest.mark.parametrize("name,kwargs,hw", _PARAMS,
                         ids=[f[0] for f in FAMILIES])
def test_family_forward(name, kwargs, hw):
    m = create_model(name, num_classes=10, dtype=jnp.float32, **kwargs)
    x = jnp.ones((1, hw, hw, 3), jnp.float32)
    # eval_shape init + positive random fill: the real init pass is the
    # single most expensive eager trace here and adds no coverage beyond
    # what the shapes give (initializer numerics are exercised by the
    # training-path tests); positive values keep BN vars/denominators sane
    vs = jax.eval_shape(lambda k: m.init(k, x, True),
                        {"params": jax.random.key(0)})
    rng = np.random.default_rng(0)
    vs = jax.tree.map(
        lambda s: jnp.asarray(rng.uniform(0.01, 0.05, s.shape), s.dtype),
        nn.meta.unbox(vs))
    y = m.apply(vs, x, True)
    assert y.shape == (1, 10)
    assert y.dtype == jnp.float32
    _check_golden_logits(name, y)
    # train mode (deterministic=False): catches inverted train/deterministic
    # conventions and exercises BN batch-stats updates + dropout rng wiring
    rngs = {"dropout": jax.random.key(1), "droppath": jax.random.key(2)}
    y2, _ = m.apply(vs, x, False, rngs=rngs, mutable=True)
    assert y2.shape == (1, 10)


def test_zoo_size():
    names = list_models()
    assert len(names) >= 250
    # every family the reference CLI can reach plus the majors we add
    for family in ["my_vit", "vit_", "convnext", "deit", "mixer", "resnet",
                   "swin", "efficientnet", "cait", "pvt_v2", "beit",
                   "regnety", "xcit", "maxvit", "swinv2_", "swinv2_cr_",
                   "eva02_", "eva_giant", "nfnet_f", "dm_nfnet_", "eca_nfnet_",
                   "nf_resnet", "nf_seresnet", "nf_ecaresnet"]:
        assert any(n.startswith(family) for n in names), family
