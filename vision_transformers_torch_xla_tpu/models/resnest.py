"""Res2Net and ResNeSt in Flax, NHWC.

Parity with the reference's dormant res2net.py / resnest.py (SURVEY
§2.2). Res2Net: the bottleneck's 3x3 stage splits channels into
`scale` groups processed hierarchically (each group's conv input adds
the previous group's output), the last group passing through (avg-pooled
on strided blocks) — multi-scale receptive fields inside one block
(reference res2net.py:18-117). ResNeSt: split attention — the 3x3 conv
produces radix branches whose gap-pooled sum drives a per-cardinality
softmax over radix, weighting the branch sum (ResNeSt paper; the
reference imports timm's SplitAttn), with deep stems and avg-down.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class Bottle2neck(nn.Module):
    """Res2Net bottleneck (reference res2net.py:18-117)."""

    features: int
    stride: int = 1
    base_width: int = 26
    scale: int = 4
    avg_down: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        width = int(math.floor(self.features * (self.base_width / 64.0)))
        out_features = self.features * 4
        num_scales = max(1, self.scale - 1)
        is_first = self.stride > 1 or x.shape[-1] != out_features

        shortcut = x
        if is_first:
            if self.avg_down and self.stride > 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
                shortcut = conv(out_features, (1, 1),
                                name="downsample_conv")(shortcut)
            else:
                shortcut = conv(out_features, (1, 1), strides=self.stride,
                                name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)

        y = nn.relu(bn(name="bn1")(conv(width * self.scale, (1, 1),
                                        name="conv1")(x)))
        parts = [y[..., i * width:(i + 1) * width]
                 for i in range(self.scale)]
        outs = []
        sp = parts[0]
        for i in range(num_scales):
            if i == 0 or is_first:
                sp = parts[i]
            else:
                sp = sp + parts[i]
            sp = conv(width, (3, 3), strides=self.stride,
                      padding=((1, 1), (1, 1)), name=f"convs_{i}")(sp)
            sp = nn.relu(bn(name=f"bns_{i}")(sp))
            outs.append(sp)
        if self.scale > 1:
            if is_first and self.stride > 1:
                outs.append(nn.avg_pool(parts[-1], (3, 3),
                                        strides=(self.stride,) * 2,
                                        padding=((1, 1), (1, 1))))
            else:
                outs.append(parts[-1])
        y = jnp.concatenate(outs, axis=-1)
        y = bn(name="bn3", scale_init=nn.initializers.zeros_init())(
            conv(out_features, (1, 1), name="conv3")(y))
        return nn.relu(y + shortcut)


class SplitAttnConv(nn.Module):
    """ResNeSt split attention over radix branches."""

    features: int
    stride: int = 1
    radix: int = 2
    cardinality: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        c = self.features
        r = self.radix
        y = conv(c * r, (3, 3), strides=self.stride,
                 padding=((1, 1), (1, 1)),
                 feature_group_count=self.cardinality * r, name="conv")(x)
        y = nn.relu(bn(name="bn0")(y))
        b, hh, ww, _ = y.shape
        y = y.reshape(b, hh, ww, r, c)
        gap = jnp.mean(jnp.sum(y, axis=3), axis=(1, 2))       # (b, c)
        rd = max(c * r // 4, 32)
        a = nn.relu(bn(name="bn1")(nn.Dense(
            rd, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="fc1")(gap)))
        a = nn.Dense(c * r, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(a)
        # rSoftMax: softmax over radix within each cardinal group
        g = self.cardinality
        a = a.reshape(b, g, r, c // g)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=2)
        a = a.astype(y.dtype).reshape(b, 1, 1, r * c).reshape(
            b, 1, 1, r, c)
        return jnp.sum(y * a, axis=3)


class ResNestBottleneck(nn.Module):
    """Reference resnest.py:18-130."""

    features: int
    stride: int = 1
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    avg_down: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        gw = int(self.features * (self.base_width / 64.0)) * self.cardinality
        out_features = self.features * 4
        shortcut = x
        if x.shape[-1] != out_features or self.stride > 1:
            if self.avg_down and self.stride > 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
                shortcut = conv(out_features, (1, 1),
                                name="downsample_conv")(shortcut)
            else:
                shortcut = conv(out_features, (1, 1), strides=self.stride,
                                name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        y = nn.relu(bn(name="bn1")(conv(gw, (1, 1), name="conv1")(x)))
        # avd: move the stride into an avg-pool after the split-attn conv
        y = SplitAttnConv(gw, 1, self.radix, self.cardinality,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="conv2")(y, deterministic)
        if self.stride > 1:
            y = nn.avg_pool(y, (3, 3), strides=(self.stride,) * 2,
                            padding=((1, 1), (1, 1)))
        y = bn(name="bn3", scale_init=nn.initializers.zeros_init())(
            conv(out_features, (1, 1), name="conv3")(y))
        return nn.relu(y + shortcut)


class _Trunk(nn.Module):
    """Shared stem/stage scaffold for Res2Net & ResNeSt."""

    block: str
    stage_sizes: Sequence[int]
    num_classes: int = 1000
    stem_type: str = ""
    stem_width: int = 32
    avg_down: bool = False
    base_width: int = 26
    scale: int = 4
    radix: int = 2
    cardinality: int = 1
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.stem_type == "deep":
            w = self.stem_width
            x = nn.relu(bn(name="stem_bn1")(conv(
                w, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                name="stem_conv1")(x)))
            x = nn.relu(bn(name="stem_bn2")(conv(
                w, (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv2")(x)))
            x = nn.relu(bn(name="stem_bn3")(conv(
                w * 2, (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv3")(x)))
        else:
            x = conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                     name="stem_conv")(x)
            x = nn.relu(bn(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n in enumerate(self.stage_sizes):
            for blk in range(n):
                stride = 2 if stage > 0 and blk == 0 else 1
                nm = f"stages_{stage}_blocks_{blk}"
                feats = 64 * (2 ** stage)
                if self.block == "res2":
                    x = Bottle2neck(feats, stride, self.base_width,
                                    self.scale, self.avg_down,
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=nm)(x, deterministic)
                else:
                    x = ResNestBottleneck(feats, stride, self.radix,
                                          self.cardinality,
                                          self.base_width, self.avg_down,
                                          dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          name=nm)(x, deterministic)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _make(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "drop_path_rate"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return _Trunk(**merged)

    return build


_NEST = dict(block="nest", stem_type="deep", avg_down=True, base_width=64)
_VARIANTS = {
    "res2net50_26w_4s": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                             base_width=26, scale=4),
    "res2net101_26w_4s": dict(block="res2", stage_sizes=(3, 4, 23, 3),
                              base_width=26, scale=4),
    "res2net50_26w_6s": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                             base_width=26, scale=6),
    "res2net50_26w_8s": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                             base_width=26, scale=8),
    "res2net50_48w_2s": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                             base_width=48, scale=2),
    "res2net50_14w_8s": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                             base_width=14, scale=8),
    "res2net50d": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                       base_width=26, scale=4, stem_type="deep",
                       avg_down=True),
    "res2net101d": dict(block="res2", stage_sizes=(3, 4, 23, 3),
                        base_width=26, scale=4, stem_type="deep",
                        avg_down=True),
    "res2next50": dict(block="res2", stage_sizes=(3, 4, 6, 3),
                       base_width=4, scale=4, cardinality=8),
    "resnest14d": dict(stage_sizes=(1, 1, 1, 1), stem_width=32, **_NEST),
    "resnest26d": dict(stage_sizes=(2, 2, 2, 2), stem_width=32, **_NEST),
    "resnest50d": dict(stage_sizes=(3, 4, 6, 3), stem_width=32, **_NEST),
    "resnest101e": dict(stage_sizes=(3, 4, 23, 3), stem_width=64, **_NEST),
    "resnest200e": dict(stage_sizes=(3, 24, 36, 3), stem_width=64,
                        **_NEST),
    "resnest269e": dict(stage_sizes=(3, 30, 48, 8), stem_width=64,
                        **_NEST),
    "resnest50d_4s2x40d": dict(stage_sizes=(3, 4, 6, 3), stem_width=32,
                               block="nest", stem_type="deep",
                               avg_down=True, base_width=40, radix=4,
                               cardinality=2),
    "resnest50d_1s4x24d": dict(stage_sizes=(3, 4, 6, 3), stem_width=32,
                               block="nest", stem_type="deep",
                               avg_down=True, base_width=24, radix=1,
                               cardinality=4),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _make(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Res2Net/ResNeSt variant {_name!r} (reference "
                   f"res2net.py/resnest.py registry surfaces).")
    setattr(_mod, _name, register_model(_fn))
