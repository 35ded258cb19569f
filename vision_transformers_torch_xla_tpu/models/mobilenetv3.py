"""MobileNetV3 + LCNet in Flax, NHWC.

Parity with the reference's dormant mobilenetv3.py (1502 LoC; SURVEY §2.2):
inverted-residual blocks with per-block kernel/expansion/SE/activation
specs, hard-swish/hard-sigmoid nonlinearities, width multipliers, and the
LCNet depthwise-separable family. The `tf_*` names are same-architecture
aliases (the reference's carry TF-ported weights + padding; weight loading
here goes through the pretrained path, so they alias the plain builders).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def _round_ch(c: float, divisor: int = 8) -> int:
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return new


# block spec: (kernel, exp_ch, out_ch, se, act, stride)
_LARGE: Tuple = (
    (3, 16, 16, False, "re", 1),
    (3, 64, 24, False, "re", 2), (3, 72, 24, False, "re", 1),
    (5, 72, 40, True, "re", 2), (5, 120, 40, True, "re", 1),
    (5, 120, 40, True, "re", 1),
    (3, 240, 80, False, "hs", 2), (3, 200, 80, False, "hs", 1),
    (3, 184, 80, False, "hs", 1), (3, 184, 80, False, "hs", 1),
    (3, 480, 112, True, "hs", 1), (3, 672, 112, True, "hs", 1),
    (5, 672, 160, True, "hs", 2), (5, 960, 160, True, "hs", 1),
    (5, 960, 160, True, "hs", 1),
)
_SMALL: Tuple = (
    (3, 16, 16, True, "re", 2),
    (3, 72, 24, False, "re", 2), (3, 88, 24, False, "re", 1),
    (5, 96, 40, True, "hs", 2), (5, 240, 40, True, "hs", 1),
    (5, 240, 40, True, "hs", 1),
    (5, 120, 48, True, "hs", 1), (5, 144, 48, True, "hs", 1),
    (5, 288, 96, True, "hs", 2), (5, 576, 96, True, "hs", 1),
    (5, 576, 96, True, "hs", 1),
)
# LCNet: depthwise-separable spec (kernel, out_ch, stride, se)
_LCNET: Tuple = (
    (3, 32, 1, False), (3, 64, 2, False), (3, 64, 1, False),
    (3, 128, 2, False), (3, 128, 1, False), (3, 256, 2, False),
    (5, 256, 1, False), (5, 256, 1, False), (5, 256, 1, False),
    (5, 256, 1, False), (5, 256, 1, False), (5, 512, 2, True),
    (5, 512, 1, True),
)


class MobileNetV3(nn.Module):
    blocks: Tuple = _LARGE
    width_mult: float = 1.0
    stem_ch: int = 16
    head_ch: int = 960
    head_hidden: int = 1280
    minimal: bool = False  # no SE, relu everywhere, 3x3 kernels
    lcnet: bool = False  # depthwise-separable block spec
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    drop_rate: float = 0.2
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _act(self, x, kind: str):
        if self.minimal or kind == "re":
            return nn.relu(x)
        return _hswish(x)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        se_conv = partial(nn.Conv, padding="SAME", dtype=self.dtype,
                          param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        stem = _round_ch(self.stem_ch * self.width_mult)
        x = conv(stem, (3, 3), strides=2, name="stem_conv")(x)
        x = self._act(bn(name="stem_bn")(x), "hs")

        dpr = np.linspace(0, self.drop_path_rate, len(self.blocks))
        in_ch = stem
        si = 0
        for bi, spec in enumerate(self.blocks):
            if self.lcnet:
                k, out, stride, se = spec
                exp, act = None, "hs"
            else:
                k, exp, out, se, act, stride = spec
                exp = _round_ch(exp * self.width_mult)
            if self.minimal:
                k, se = 3, False
            out = _round_ch(out * self.width_mult)
            if stride > 1:
                # stage-boundary feature tap (models/features.py): last
                # activation of each resolution, pre-downsample
                self.sow("intermediates", f"stage_{si}", x)
                si += 1
            shortcut = x
            name = f"blocks_{bi}"
            y = x
            if not self.lcnet and exp != in_ch:
                y = conv(exp, (1, 1), name=f"{name}_pw_exp")(y)
                y = self._act(bn(name=f"{name}_bn_exp")(y), act)
            mid = y.shape[-1]
            y = conv(mid, (k, k), strides=stride, feature_group_count=mid,
                     name=f"{name}_dw")(y)
            y = self._act(bn(name=f"{name}_bn_dw")(y), act)
            if se:
                rd = _round_ch(mid / 4)
                s = y.mean(axis=(1, 2), keepdims=True)
                s = nn.relu(se_conv(rd, (1, 1), name=f"{name}_se_reduce")(s))
                s = _hsigmoid(se_conv(mid, (1, 1),
                                      name=f"{name}_se_expand")(s))
                y = y * s
            y = bn(name=f"{name}_bn_pw")(conv(out, (1, 1),
                                               name=f"{name}_pw")(y))
            if self.lcnet:
                y = self._act(y, "hs")
            if stride == 1 and in_ch == out and not self.lcnet:
                rng = None if deterministic or dpr[bi] == 0 else \
                    self.make_rng("droppath")
                y = shortcut + drop_path(y, float(dpr[bi]), deterministic,
                                         rng)
            x = y
            in_ch = out

        head = _round_ch(self.head_ch * self.width_mult) \
            if not self.lcnet else self.head_ch
        if not self.lcnet:
            x = conv(head, (1, 1), name="head_conv")(x)
            x = self._act(bn(name="head_bn")(x), "hs")
        # final stage tap (deepest resolution, post head conv — timm folds
        # this conv into `blocks`, so its output is the last feature hook)
        self.sow("intermediates", f"stage_{si}", x)
        x = x.mean(axis=(1, 2), keepdims=True)
        x = se_conv(self.head_hidden, (1, 1), name="head_fc")(x)
        x = self._act(x, "hs")[:, 0, 0]
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="classifier")(x).astype(jnp.float32)


def _mnv3(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return MobileNetV3(**merged)

    return build


_L = dict(blocks=_LARGE, head_ch=960, head_hidden=1280)
_S = dict(blocks=_SMALL, head_ch=576, head_hidden=1024)

_VARIANTS = {
    "mobilenetv3_large_075": dict(_L, width_mult=0.75),
    "mobilenetv3_large_100": dict(_L, width_mult=1.0),
    "mobilenetv3_small_050": dict(_S, width_mult=0.5),
    "mobilenetv3_small_075": dict(_S, width_mult=0.75),
    "mobilenetv3_small_100": dict(_S, width_mult=1.0),
    "mobilenetv3_rw": dict(_L, width_mult=1.0),
    "tf_mobilenetv3_large_075": dict(_L, width_mult=0.75),
    "tf_mobilenetv3_large_100": dict(_L, width_mult=1.0),
    "tf_mobilenetv3_large_minimal_100": dict(_L, width_mult=1.0,
                                             minimal=True),
    "tf_mobilenetv3_small_075": dict(_S, width_mult=0.75),
    "tf_mobilenetv3_small_100": dict(_S, width_mult=1.0),
    "tf_mobilenetv3_small_minimal_100": dict(_S, width_mult=1.0,
                                             minimal=True),
    "lcnet_035": dict(blocks=_LCNET, lcnet=True, width_mult=0.35,
                      head_hidden=1280),
    "lcnet_050": dict(blocks=_LCNET, lcnet=True, width_mult=0.5,
                      head_hidden=1280),
    "lcnet_075": dict(blocks=_LCNET, lcnet=True, width_mult=0.75,
                      head_hidden=1280),
    "lcnet_100": dict(blocks=_LCNET, lcnet=True, width_mult=1.0,
                      head_hidden=1280),
    "lcnet_150": dict(blocks=_LCNET, lcnet=True, width_mult=1.5,
                      head_hidden=1280),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _mnv3(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MobileNetV3/LCNet variant {_name!r} (reference "
                   f"mobilenetv3.py registry surface).")
    setattr(_mod, _name, register_model(_fn))


# ---------------------------------------------------------------------------
# Builder-based additions: MobileNetV3 large_150d, FBNetV3, MobileNetV4
# (reference mobilenetv3.py:533-644 _gen_mobilenet_v3, :645-715 _gen_fbnetv3,
# :761-1040 _gen_mobilenet_v4). These decode timm arch strings through
# effnet_builder.EffNet with the MobileNetV3-style head (pool -> 1x1 conv
# [-> norm] -> act).
# ---------------------------------------------------------------------------

from vision_transformers_torch_xla_tpu.models.effnet_builder import (  # noqa: E402
    EffNet as _EffNet,
    decode_arch_def as _decode_arch_def,
)

_MNV3_LARGE = (
    ("ds_r1_k3_s1_e1_c16_nre",),
    ("ir_r1_k3_s2_e4_c24_nre", "ir_r1_k3_s1_e3_c24_nre"),
    ("ir_r3_k5_s2_e3_c40_se0.25_nre",),
    ("ir_r1_k3_s2_e6_c80", "ir_r1_k3_s1_e2.5_c80", "ir_r2_k3_s1_e2.3_c80"),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("cn_r1_k1_s1_c960",),
)
_FBNETV3_B = (
    ("ds_r2_k3_s1_e1_c16",),
    ("ir_r1_k5_s2_e4_c24", "ir_r3_k5_s1_e2_c24"),
    ("ir_r1_k5_s2_e5_c40_se0.25", "ir_r4_k5_s1_e3_c40_se0.25"),
    ("ir_r1_k5_s2_e5_c72", "ir_r4_k3_s1_e3_c72"),
    ("ir_r1_k3_s1_e5_c120_se0.25", "ir_r5_k5_s1_e3_c120_se0.25"),
    ("ir_r1_k3_s2_e6_c184_se0.25", "ir_r5_k5_s1_e4_c184_se0.25",
     "ir_r1_k5_s1_e6_c224_se0.25"),
    ("cn_r1_k1_s1_c1344",),
)
_FBNETV3_D = (
    ("ds_r2_k3_s1_e1_c16",),
    ("ir_r1_k3_s2_e5_c24", "ir_r5_k3_s1_e2_c24"),
    ("ir_r1_k5_s2_e4_c40_se0.25", "ir_r4_k3_s1_e3_c40_se0.25"),
    ("ir_r1_k3_s2_e5_c72", "ir_r4_k3_s1_e3_c72"),
    ("ir_r1_k3_s1_e5_c128_se0.25", "ir_r6_k5_s1_e3_c128_se0.25"),
    ("ir_r1_k3_s2_e6_c208_se0.25", "ir_r5_k5_s1_e5_c208_se0.25",
     "ir_r1_k5_s1_e6_c240_se0.25"),
    ("cn_r1_k1_s1_c1440",),
)
_FBNETV3_G = (
    ("ds_r3_k3_s1_e1_c24",),
    ("ir_r1_k5_s2_e4_c40", "ir_r4_k5_s1_e2_c40"),
    ("ir_r1_k5_s2_e4_c56_se0.25", "ir_r4_k5_s1_e3_c56_se0.25"),
    ("ir_r1_k5_s2_e5_c104", "ir_r4_k3_s1_e3_c104"),
    ("ir_r1_k3_s1_e5_c160_se0.25", "ir_r8_k5_s1_e3_c160_se0.25"),
    ("ir_r1_k3_s2_e6_c264_se0.25", "ir_r6_k5_s1_e5_c264_se0.25",
     "ir_r2_k5_s1_e6_c288_se0.25"),
    ("cn_r1_k1_s1_c1728",),
)
_MNV4_CONV_SMALL = (
    ("cn_r1_k3_s2_e1_c32", "cn_r1_k1_s1_e1_c32"),
    ("cn_r1_k3_s2_e1_c96", "cn_r1_k1_s1_e1_c64"),
    ("uir_r1_a5_k5_s2_e3_c96", "uir_r4_a0_k3_s1_e2_c96",
     "uir_r1_a3_k0_s1_e4_c96"),
    ("uir_r1_a3_k3_s2_e6_c128", "uir_r1_a5_k5_s1_e4_c128",
     "uir_r1_a0_k5_s1_e4_c128", "uir_r1_a0_k5_s1_e3_c128",
     "uir_r2_a0_k3_s1_e4_c128"),
    ("cn_r1_k1_s1_c960",),
)
_MNV4_CONV_MEDIUM = (
    ("er_r1_k3_s2_e4_c48",),
    ("uir_r1_a3_k5_s2_e4_c80", "uir_r1_a3_k3_s1_e2_c80"),
    ("uir_r1_a3_k5_s2_e6_c160", "uir_r2_a3_k3_s1_e4_c160",
     "uir_r1_a3_k5_s1_e4_c160", "uir_r1_a3_k3_s1_e4_c160",
     "uir_r1_a3_k0_s1_e4_c160", "uir_r1_a0_k0_s1_e2_c160",
     "uir_r1_a3_k0_s1_e4_c160"),
    ("uir_r1_a5_k5_s2_e6_c256", "uir_r1_a5_k5_s1_e4_c256",
     "uir_r2_a3_k5_s1_e4_c256", "uir_r1_a0_k0_s1_e4_c256",
     "uir_r1_a3_k0_s1_e4_c256", "uir_r1_a3_k5_s1_e2_c256",
     "uir_r1_a5_k5_s1_e4_c256", "uir_r2_a0_k0_s1_e4_c256",
     "uir_r1_a5_k0_s1_e2_c256"),
    ("cn_r1_k1_s1_c960",),
)
_MNV4_CONV_LARGE = (
    ("er_r1_k3_s2_e4_c48",),
    ("uir_r1_a3_k5_s2_e4_c96", "uir_r1_a3_k3_s1_e4_c96"),
    ("uir_r1_a3_k5_s2_e4_c192", "uir_r3_a3_k3_s1_e4_c192",
     "uir_r1_a3_k5_s1_e4_c192", "uir_r5_a5_k3_s1_e4_c192",
     "uir_r1_a3_k0_s1_e4_c192"),
    ("uir_r4_a5_k5_s2_e4_c512", "uir_r1_a5_k0_s1_e4_c512",
     "uir_r1_a5_k3_s1_e4_c512", "uir_r2_a5_k0_s1_e4_c512",
     "uir_r1_a5_k3_s1_e4_c512", "uir_r1_a5_k5_s1_e4_c512",
     "uir_r3_a5_k0_s1_e4_c512"),
    ("cn_r1_k1_s1_c960",),
)
_MNV4_HYBRID_MEDIUM = (
    ("er_r1_k3_s2_e4_c48",),
    ("uir_r1_a3_k5_s2_e4_c80", "uir_r1_a3_k3_s1_e2_c80"),
    ("uir_r1_a3_k5_s2_e6_c160", "uir_r1_a0_k0_s1_e2_c160",
     "uir_r1_a3_k3_s1_e4_c160", "uir_r1_a3_k5_s1_e4_c160",
     "mqa_r1_k3_h4_s1_v2_d64_c160", "uir_r1_a3_k3_s1_e4_c160",
     "mqa_r1_k3_h4_s1_v2_d64_c160", "uir_r1_a3_k0_s1_e4_c160",
     "mqa_r1_k3_h4_s1_v2_d64_c160", "uir_r1_a3_k3_s1_e4_c160",
     "mqa_r1_k3_h4_s1_v2_d64_c160", "uir_r1_a3_k0_s1_e4_c160"),
    ("uir_r1_a5_k5_s2_e6_c256", "uir_r1_a5_k5_s1_e4_c256",
     "uir_r2_a3_k5_s1_e4_c256", "uir_r1_a0_k0_s1_e2_c256",
     "uir_r1_a3_k5_s1_e2_c256", "uir_r1_a0_k0_s1_e2_c256",
     "uir_r1_a0_k0_s1_e4_c256", "mqa_r1_k3_h4_s1_d64_c256",
     "uir_r1_a3_k0_s1_e4_c256", "mqa_r1_k3_h4_s1_d64_c256",
     "uir_r1_a5_k5_s1_e4_c256", "mqa_r1_k3_h4_s1_d64_c256",
     "uir_r1_a5_k0_s1_e4_c256", "mqa_r1_k3_h4_s1_d64_c256",
     "uir_r1_a5_k0_s1_e4_c256"),
    ("cn_r1_k1_s1_c960",),
)
_MNV4_HYBRID_LARGE = (
    ("er_r1_k3_s2_e4_c48",),
    ("uir_r1_a3_k5_s2_e4_c96", "uir_r1_a3_k3_s1_e4_c96"),
    ("uir_r1_a3_k5_s2_e4_c192", "uir_r3_a3_k3_s1_e4_c192",
     "uir_r1_a3_k5_s1_e4_c192", "uir_r2_a5_k3_s1_e4_c192",
     "mqa_r1_k3_h8_s1_v2_d48_c192", "uir_r1_a5_k3_s1_e4_c192",
     "mqa_r1_k3_h8_s1_v2_d48_c192", "uir_r1_a5_k3_s1_e4_c192",
     "mqa_r1_k3_h8_s1_v2_d48_c192", "uir_r1_a5_k3_s1_e4_c192",
     "mqa_r1_k3_h8_s1_v2_d48_c192", "uir_r1_a3_k0_s1_e4_c192"),
    ("uir_r4_a5_k5_s2_e4_c512", "uir_r1_a5_k0_s1_e4_c512",
     "uir_r1_a5_k3_s1_e4_c512", "uir_r2_a5_k0_s1_e4_c512",
     "uir_r1_a5_k3_s1_e4_c512", "uir_r1_a5_k5_s1_e4_c512",
     "mqa_r1_k3_h8_s1_d64_c512", "uir_r1_a5_k0_s1_e4_c512",
     "mqa_r1_k3_h8_s1_d64_c512", "uir_r1_a5_k0_s1_e4_c512",
     "mqa_r1_k3_h8_s1_d64_c512", "uir_r1_a5_k0_s1_e4_c512",
     "mqa_r1_k3_h8_s1_d64_c512", "uir_r1_a5_k0_s1_e4_c512"),
    ("cn_r1_k1_s1_c960",),
)


def _mnv3_builder(arch, cm=1.0, dm=1.0, *, stem=16, num_features=1280,
                  head_bias=True, head_norm=False, act="hard_swish",
                  se_from_exp=True, se_round_divisible=True,
                  round_limit=0.9, fix_stem=None, layer_scale=None, aa=""):
    blocks = _decode_arch_def(arch, dm)
    if fix_stem is None:
        fix_stem = cm < 0.75 if se_from_exp else False

    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        merged = dict(block_args=blocks, stem_size=stem, fix_stem=fix_stem,
                      num_features=num_features, head_style="mnv3",
                      head_bias=head_bias, head_norm=head_norm, act=act,
                      se_from_exp=se_from_exp, se_gate="hard_sigmoid",
                      se_force_act="relu",
                      se_round_divisible=se_round_divisible,
                      round_mult=cm, round_limit=round_limit,
                      layer_scale_init_value=layer_scale, aa=aa,
                      drop_rate=0.2)
        merged.update(kw)
        return _EffNet(**merged)

    return build


_BUILDER_VARIANTS = {
    "mobilenetv3_large_150d": _mnv3_builder(_MNV3_LARGE, 1.5, 1.2),
    "fbnetv3_b": _mnv3_builder(_FBNETV3_B, stem=16, num_features=1984,
                               head_bias=False, se_from_exp=False,
                               round_limit=0.95),
    "fbnetv3_d": _mnv3_builder(_FBNETV3_D, stem=24, num_features=1984,
                               head_bias=False, se_from_exp=False,
                               round_limit=0.95),
    "fbnetv3_g": _mnv3_builder(_FBNETV3_G, stem=32, num_features=1984,
                               head_bias=False, se_from_exp=False,
                               round_limit=0.95),
    "mobilenetv4_conv_small_035": _mnv3_builder(
        _MNV4_CONV_SMALL, 0.35, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=True),
    "mobilenetv4_conv_small_050": _mnv3_builder(
        _MNV4_CONV_SMALL, 0.50, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=True),
    "mobilenetv4_conv_small": _mnv3_builder(
        _MNV4_CONV_SMALL, 1.0, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=False),
    "mobilenetv4_conv_medium": _mnv3_builder(
        _MNV4_CONV_MEDIUM, 1.0, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=False),
    "mobilenetv4_conv_aa_medium": _mnv3_builder(
        _MNV4_CONV_MEDIUM, 1.0, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=False, aa="avg"),
    "mobilenetv4_conv_blur_medium": _mnv3_builder(
        _MNV4_CONV_MEDIUM, 1.0, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=False, aa="blur"),
    "mobilenetv4_conv_large": _mnv3_builder(
        _MNV4_CONV_LARGE, 1.0, stem=24, head_bias=False, head_norm=True,
        act="relu", fix_stem=False),
    "mobilenetv4_conv_aa_large": _mnv3_builder(
        _MNV4_CONV_LARGE, 1.0, stem=24, head_bias=False, head_norm=True,
        act="relu", fix_stem=False, aa="avg"),
    "mobilenetv4_hybrid_medium": _mnv3_builder(
        _MNV4_HYBRID_MEDIUM, 1.0, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=False, layer_scale=1e-5),
    "mobilenetv4_hybrid_medium_075": _mnv3_builder(
        _MNV4_HYBRID_MEDIUM, 0.75, stem=32, head_bias=False, head_norm=True,
        act="relu", fix_stem=True, layer_scale=1e-5),
    "mobilenetv4_hybrid_large": _mnv3_builder(
        _MNV4_HYBRID_LARGE, 1.0, stem=24, head_bias=False, head_norm=True,
        act="gelu", fix_stem=False, layer_scale=1e-5),
    "mobilenetv4_hybrid_large_075": _mnv3_builder(
        _MNV4_HYBRID_LARGE, 0.75, stem=24, head_bias=False, head_norm=True,
        act="gelu", fix_stem=True, layer_scale=1e-5),
}

for _name, _fn in _BUILDER_VARIANTS.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MobileNetV3/V4/FBNetV3 variant {_name!r} (reference "
                   f"mobilenetv3.py registry surface, arch-string decoded).")
    setattr(_mod, _name, register_model(_fn))
