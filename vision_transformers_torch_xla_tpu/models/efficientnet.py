"""EfficientNet (V1) in Flax, NHWC.

Parity with the reference's dormant efficientnet.py (2935 LoC + builder
files; SURVEY §2.2): MBConv blocks (expand -> depthwise -> SE -> project)
with BN + SiLU, compound width/depth scaling, stochastic depth. B0-B4
variants registered.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

# (expand, channels, layers, stride, kernel) per stage — EfficientNet-B0 base
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _round_channels(c: float, divisor: int = 8) -> int:
    new = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new < 0.9 * c:
        new += divisor
    return new


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        mid = self.in_ch * self.expand
        shortcut = x
        y = x
        if self.expand != 1:
            y = nn.silu(bn(name="bn_exp")(conv(mid, (1, 1), name="conv_exp")(y)))
        y = conv(mid, (self.kernel, self.kernel), strides=self.stride,
                 feature_group_count=mid, padding="SAME", name="conv_dw")(y)
        y = nn.silu(bn(name="bn_dw")(y))
        if self.se_ratio > 0:
            se_ch = max(1, int(self.in_ch * self.se_ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.silu(nn.Conv(se_ch, (1, 1), dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="se_reduce")(s))
            s = nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="se_expand")(s))
            y = y * s
        y = bn(name="bn_proj")(conv(self.out_ch, (1, 1), name="conv_proj")(y))
        if self.stride == 1 and self.in_ch == self.out_ch:
            rng = None if deterministic or self.drop_path_rate == 0 else \
                self.make_rng("droppath")
            y = shortcut + drop_path(y, self.drop_path_rate, deterministic, rng)
        return y


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 1000
    drop_path_rate: float = 0.2
    drop_rate: float = 0.2
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        stem = _round_channels(32 * self.width_mult)
        x = nn.Conv(stem, (3, 3), strides=2, padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv")(x)
        x = nn.silu(bn(name="stem_bn")(x))

        total_blocks = sum(int(math.ceil(n * self.depth_mult))
                           for _, _, n, _, _ in _B0_STAGES)
        bi = 0
        in_ch = stem
        for si, (expand, ch, n, stride, kernel) in enumerate(_B0_STAGES):
            out_ch = _round_channels(ch * self.width_mult)
            reps = int(math.ceil(n * self.depth_mult))
            for r in range(reps):
                x = MBConv(in_ch, out_ch, expand,
                           stride if r == 0 else 1, kernel,
                           drop_path_rate=self.drop_path_rate * bi / total_blocks,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"stages_{si}_blocks_{r}")(x, deterministic)
                in_ch = out_ch
                bi += 1
        head_ch = _round_channels(1280 * self.width_mult)
        x = nn.Conv(head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head_conv")(x)
        x = nn.silu(bn(name="head_bn")(x))
        x = x.mean(axis=(1, 2))
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="classifier")(x).astype(jnp.float32)


def _effnet(width, depth, **kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks"):
        kw.pop(k, None)
    return EfficientNet(width_mult=width, depth_mult=depth, **kw)


@register_model
def efficientnet_b0(**kw):
    return _effnet(1.0, 1.0, **kw)


@register_model
def efficientnet_b1(**kw):
    return _effnet(1.0, 1.1, **kw)


@register_model
def efficientnet_b2(**kw):
    return _effnet(1.1, 1.2, **kw)


@register_model
def efficientnet_b3(**kw):
    return _effnet(1.2, 1.4, **kw)


@register_model
def efficientnet_b4(**kw):
    return _effnet(1.4, 1.8, **kw)
