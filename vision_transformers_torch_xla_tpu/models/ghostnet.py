"""GhostNet v1/v2 in Flax, NHWC.

Parity with the reference's dormant ghostnet.py (~950 LoC; SURVEY §2.2):
Ghost modules generate half the channels with a 1x1 conv and the rest
with a cheap 3x3 depthwise "ghost" conv; bottlenecks are ghost-expand /
(strided dw) / optional SE / ghost-project with a dw+pw shortcut
(reference ghostnet.py:35-407). v2 adds DFC attention — a downsampled
1x1 + 1x5 + 5x1 depthwise gate, sigmoid-scaled and nearest-upsampled —
on the expansion module of every block past the second (reference
:70-112, 628-632).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _make_divisible(v, divisor=4):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_CFGS = (
    ((3, 16, 16, 0, 1),),
    ((3, 48, 24, 0, 2),),
    ((3, 72, 24, 0, 1),),
    ((5, 72, 40, 0.25, 2),),
    ((5, 120, 40, 0.25, 1),),
    ((3, 240, 80, 0, 2),),
    ((3, 200, 80, 0, 1), (3, 184, 80, 0, 1), (3, 184, 80, 0, 1),
     (3, 480, 112, 0.25, 1), (3, 672, 112, 0.25, 1)),
    ((5, 672, 160, 0.25, 2),),
    ((5, 960, 160, 0, 1), (5, 960, 160, 0.25, 1), (5, 960, 160, 0, 1),
     (5, 960, 160, 0.25, 1)),
)


class _ConvBn(nn.Module):
    features: int
    kernel: tuple = (1, 1)
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kh, kw = self.kernel
        x = nn.Conv(self.features, (kh, kw),
                    strides=(self.stride, self.stride),
                    padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class GhostModule(nn.Module):
    out_chs: int
    act: bool = True
    dfc: bool = False                 # v2 DFC attention gate
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        init_chs = math.ceil(self.out_chs / 2)
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x1 = _ConvBn(init_chs, act=self.act, name="primary",
                     **p)(x, deterministic)
        x2 = _ConvBn(init_chs, (3, 3), groups=init_chs, act=self.act,
                     name="cheap", **p)(x1, deterministic)
        out = jnp.concatenate([x1, x2], axis=-1)[..., :self.out_chs]
        if not self.dfc:
            return out
        g = nn.avg_pool(x, (2, 2), strides=(2, 2))
        g = _ConvBn(self.out_chs, act=False, name="short1",
                    **p)(g, deterministic)
        g = _ConvBn(self.out_chs, (1, 5), groups=self.out_chs, act=False,
                    name="short2", **p)(g, deterministic)
        g = _ConvBn(self.out_chs, (5, 1), groups=self.out_chs, act=False,
                    name="short3", **p)(g, deterministic)
        g = jax.nn.sigmoid(g.astype(jnp.float32)).astype(out.dtype)
        g = jax.image.resize(g, out.shape, method="nearest")
        return out * g


class GhostBottleneck(nn.Module):
    mid_chs: int
    out_chs: int
    dw_kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    dfc: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_chs = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = GhostModule(self.mid_chs, dfc=self.dfc, name="ghost1",
                        **p)(x, deterministic)
        if self.stride > 1:
            y = _ConvBn(self.mid_chs, (self.dw_kernel, self.dw_kernel),
                        self.stride, groups=self.mid_chs, act=False,
                        name="dw", **p)(y, deterministic)
        if self.se_ratio:
            rd = _make_divisible(self.mid_chs * self.se_ratio)
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(rd, (1, 1), name="se_reduce", **p)(s))
            s = nn.Conv(self.mid_chs, (1, 1), name="se_expand", **p)(s)
            # hard-sigmoid gate (timm _SE_LAYER for ghostnet)
            y = y * jnp.clip(s.astype(jnp.float32) / 6 + 0.5, 0, 1
                             ).astype(y.dtype)
        y = GhostModule(self.out_chs, act=False, name="ghost2",
                        **p)(y, deterministic)
        if in_chs == self.out_chs and self.stride == 1:
            return x + y
        s = _ConvBn(in_chs, (self.dw_kernel, self.dw_kernel), self.stride,
                    groups=in_chs, act=False, name="shortcut_dw",
                    **p)(x, deterministic)
        s = _ConvBn(self.out_chs, act=False, name="shortcut_pw",
                    **p)(s, deterministic)
        return s + y


class GhostNet(nn.Module):
    """Reference ghostnet.py:586-800 (GhostNet)."""

    num_classes: int = 1000
    width: float = 1.0
    version: str = "v1"
    cfgs: Sequence = _CFGS
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        stem = _make_divisible(16 * self.width)
        x = _ConvBn(stem, (3, 3), 2, name="stem",
                    **p)(x.astype(self.dtype), deterministic)
        li = 0
        exp = 16
        for si, stage in enumerate(self.cfgs):
            for k, exp, c, se, s in stage:
                dfc = self.version == "v2" and li > 1
                x = GhostBottleneck(
                    _make_divisible(exp * self.width),
                    _make_divisible(c * self.width), k, s, se, dfc=dfc,
                    name=f"b{si}_{li}", **p)(x, deterministic)
                li += 1
        x = _ConvBn(_make_divisible(exp * self.width), name="final_conv",
                    **p)(x, deterministic)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(1280, name="conv_head", **p)(x))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="classifier",
                        **p)(x).astype(jnp.float32)


def _ghostnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return GhostNet(**merged)

    return build


_VARIANTS = {
    "ghostnet_050": dict(width=0.5),
    "ghostnet_100": dict(width=1.0),
    "ghostnet_130": dict(width=1.3),
    "ghostnetv2_100": dict(width=1.0, version="v2"),
    "ghostnetv2_130": dict(width=1.3, version="v2"),
    "ghostnetv2_160": dict(width=1.6, version="v2"),
    # v3: reference ghostnetv3 names; train-time reparam branches fold
    # into the v2-style trunk (registered on the v2 path here)
    "ghostnetv3_050": dict(width=0.5, version="v2"),
    "ghostnetv3_100": dict(width=1.0, version="v2"),
    "ghostnetv3_130": dict(width=1.3, version="v2"),
    "ghostnetv3_160": dict(width=1.6, version="v2"),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _ghostnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"GhostNet variant {_name!r} (reference ghostnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
