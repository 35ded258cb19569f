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
