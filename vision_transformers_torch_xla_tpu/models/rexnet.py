"""ReXNet in Flax, NHWC.

Parity with the reference's dormant rexnet.py (~570 LoC; SURVEY §2.2):
MobileNetV2-style linear bottlenecks whose output width grows linearly
layer by layer (the "rank-expansion" schedule, reference
rexnet.py:132-170); partial residuals add the shortcut only onto the
first in_chs channels; SE (with BN in the squeeze) from stage 3 on;
swish expansion / relu6 depthwise activations.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _make_divisible(v, divisor=1):
    if divisor <= 1:
        return int(v)
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _block_cfg(width_mult=1.0, depth_mult=1.0, initial_chs=16,
               final_chs=180, se_ratio=1 / 12, ch_div=1):
    layers = [math.ceil(e * depth_mult) for e in (1, 2, 2, 3, 3, 5)]
    strides = sum([[s] + [1] * (n - 1)
                   for n, s in zip(layers, (1, 2, 2, 2, 1, 2))], [])
    exp_ratios = [1] * layers[0] + [6] * sum(layers[1:])
    depth = sum(layers)
    base = initial_chs / width_mult if width_mult < 1.0 else initial_chs
    out_chs = []
    for _ in range(depth):
        out_chs.append(_make_divisible(round(base * width_mult), ch_div))
        base += final_chs / depth
    se_ratios = ([0.0] * (layers[0] + layers[1]) +
                 [se_ratio] * sum(layers[2:]))
    return list(zip(out_chs, exp_ratios, strides, se_ratios))


class _ConvBnAct(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "swish"                 # 'swish' | 'relu6' | ''
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        if self.act == "swish":
            return nn.silu(x)
        if self.act == "relu6":
            return jnp.minimum(nn.relu(x), 6.0)
        return x


class RexNet(nn.Module):
    """Reference rexnet.py:235-400 (RexNet)."""

    num_classes: int = 1000
    width_mult: float = 1.0
    depth_mult: float = 1.0
    ch_div: int = 1
    se_ratio: float = 1 / 12
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        wm = self.width_mult
        stem = _make_divisible(32 * wm if wm >= 1 else 32, self.ch_div)
        x = _ConvBnAct(stem, 3, 2, name="stem",
                       **p)(x.astype(self.dtype), det)
        cfg = _block_cfg(wm, self.depth_mult, se_ratio=self.se_ratio,
                         ch_div=self.ch_div)
        for i, (out, exp, stride, se) in enumerate(cfg):
            in_chs = x.shape[-1]
            shortcut = x
            y = x
            if exp != 1.0:
                dw = _make_divisible(round(in_chs * exp), self.ch_div)
                y = _ConvBnAct(dw, name=f"b{i}_exp", **p)(y, det)
            else:
                dw = in_chs
            y = _ConvBnAct(dw, 3, stride, groups=dw, act="",
                           name=f"b{i}_dw", **p)(y, det)
            if se > 0:
                rd = _make_divisible(int(dw * se), self.ch_div)
                s = jnp.mean(y, axis=(1, 2), keepdims=True)
                s = nn.Conv(rd, (1, 1), use_bias=False,
                            name=f"b{i}_se_r", **p)(s)
                s = nn.relu(nn.BatchNorm(
                    use_running_average=det, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"b{i}_se_bn")(s))
                s = nn.Conv(dw, (1, 1), name=f"b{i}_se_e", **p)(s)
                y = y * jax.nn.sigmoid(
                    s.astype(jnp.float32)).astype(y.dtype)
            y = jnp.minimum(nn.relu(y), 6.0)
            y = _ConvBnAct(out, act="", name=f"b{i}_pwl", **p)(y, det)
            if stride == 1 and in_chs <= out:
                y = jnp.concatenate(
                    [y[..., :in_chs] + shortcut, y[..., in_chs:]], axis=-1)
            x = y
        pen = _make_divisible(1280 * wm, self.ch_div)
        x = _ConvBnAct(pen, name="final_conv", **p)(x, det)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _rexnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return RexNet(**merged)

    return build


_VARIANTS = {
    "rexnet_100": dict(width_mult=1.0),
    "rexnet_130": dict(width_mult=1.3),
    "rexnet_150": dict(width_mult=1.5),
    "rexnet_200": dict(width_mult=2.0),
    "rexnet_300": dict(width_mult=3.0),
    "rexnetr_100": dict(width_mult=1.0, ch_div=8),
    "rexnetr_130": dict(width_mult=1.3, ch_div=8),
    "rexnetr_150": dict(width_mult=1.5, ch_div=8),
    "rexnetr_200": dict(width_mult=2.0, ch_div=8),
    "rexnetr_300": dict(width_mult=3.0, ch_div=8),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _rexnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"ReXNet variant {_name!r} (reference rexnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
