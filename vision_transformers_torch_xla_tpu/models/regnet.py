"""RegNet-Y in Flax, NHWC.

Parity with the reference's dormant regnet.py (1466 LoC): the quantized
linear width design (w = w0 + w_a * i, snapped to w_m-spaced groups), Y-style
bottleneck blocks with group conv + SE, BN+ReLU.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _regnet_widths(w0: float, wa: float, wm: float, depth: int,
                   group_w: int) -> Tuple[Tuple[int, int], ...]:
    """Per-stage (width, depth) from the RegNet design rules."""
    ks = np.round(np.log((w0 + wa * np.arange(depth)) / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = np.round(widths / 8) * 8
    widths = [int(min(w, (w // group_w) * group_w) or group_w) for w in widths]
    stage_widths, stage_depths = [], []
    for w in widths:
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(w)
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    return tuple(zip(stage_widths, stage_depths))


class YBlock(nn.Module):
    width: int
    stride: int
    group_w: int
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        w = self.width
        groups = max(1, w // self.group_w)
        shortcut = x
        if x.shape[-1] != w or self.stride > 1:
            shortcut = bn(name="down_bn")(
                conv(w, (1, 1), strides=self.stride, name="down_conv")(x))
        y = nn.relu(bn(name="bn1")(conv(w, (1, 1), name="conv1")(x)))
        y = nn.relu(bn(name="bn2")(
            conv(w, (3, 3), strides=self.stride, padding="SAME",
                 feature_group_count=groups, name="conv2")(y)))
        if self.se_ratio > 0:
            se_ch = max(1, int(x.shape[-1] * self.se_ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(se_ch, (1, 1), dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="se_reduce")(s))
            s = nn.sigmoid(nn.Conv(w, (1, 1), dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="se_expand")(s))
            y = y * s
        y = bn(name="bn3")(conv(w, (1, 1), name="conv3")(y))
        return nn.relu(y + shortcut)


class RegNetY(nn.Module):
    w0: float = 48
    wa: float = 27.89
    wm: float = 2.09
    depth: int = 16
    group_w: int = 8
    num_classes: int = 1000
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=2, padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="stem_bn")(x))
        for si, (width, depth) in enumerate(
                _regnet_widths(self.w0, self.wa, self.wm, self.depth,
                               self.group_w)):
            for bi in range(depth):
                x = YBlock(width, stride=2 if bi == 0 else 1,
                           group_w=self.group_w, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"stages_{si}_blocks_{bi}")(x, deterministic)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _regnety(_w0, _wa, _wm, _depth, _group_w, **kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks", "drop_path_rate"):
        kw.pop(k, None)
    kw.setdefault("w0", _w0)
    kw.setdefault("wa", _wa)
    kw.setdefault("wm", _wm)
    kw.setdefault("depth", _depth)
    kw.setdefault("group_w", _group_w)
    return RegNetY(**kw)


@register_model
def regnety_004(**kw):
    return _regnety(48, 27.89, 2.09, 16, 8, **kw)


@register_model
def regnety_016(**kw):
    return _regnety(48, 20.71, 2.65, 27, 24, **kw)


@register_model
def regnety_032(**kw):
    return _regnety(80, 42.63, 2.66, 21, 24, **kw)
