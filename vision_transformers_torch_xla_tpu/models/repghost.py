"""RepGhostNet in Flax, NHWC (train-time multi-branch form).

Parity with the reference's dormant repghost.py (551 LoC; SURVEY §2.2):
RepGhost modules replace GhostNet's concat with a reparameterizable
ADD — primary 1x1 conv-BN-ReLU, cheap depthwise 3x3 + a parallel
BN-identity fusion branch summed before the activation (foldable at
inference, reference repghost.py:29-133). Bottlenecks/SE/stem/head
follow the GhostNet layout with halved expansion sizes.
"""
from __future__ import annotations

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
    ((3, 8, 16, 0, 1),),
    ((3, 24, 24, 0, 2),),
    ((3, 36, 24, 0, 1),),
    ((5, 36, 40, 0.25, 2),),
    ((5, 60, 40, 0.25, 1),),
    ((3, 120, 80, 0, 2),),
    ((3, 100, 80, 0, 1), (3, 120, 80, 0, 1), (3, 120, 80, 0, 1),
     (3, 240, 112, 0.25, 1), (3, 336, 112, 0.25, 1)),
    ((5, 336, 160, 0.25, 2),),
    ((5, 480, 160, 0, 1), (5, 480, 160, 0.25, 1), (5, 480, 160, 0, 1),
     (5, 480, 160, 0.25, 1)),
)


class _ConvBn(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
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
        return nn.relu(x) if self.act else x


class RepGhostModule(nn.Module):
    out_chs: int
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x1 = _ConvBn(self.out_chs, act=self.act, name="primary",
                     **p)(x, deterministic)
        x2 = _ConvBn(self.out_chs, 3, groups=self.out_chs, act=False,
                     name="cheap", **p)(x1, deterministic)
        # reparam fusion branch: BN over the identity
        x2 = x2 + nn.BatchNorm(use_running_average=deterministic,
                               momentum=0.9, epsilon=1e-5,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="fusion_bn")(x1)
        return nn.relu(x2) if self.act else x2


class RepGhostNet(nn.Module):
    """Reference repghost.py:300-480 (RepGhostNet)."""

    num_classes: int = 1000
    width: float = 1.0
    cfgs: Sequence = _CFGS
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        stem = _make_divisible(16 * self.width)
        x = _ConvBn(stem, 3, 2, name="stem",
                    **p)(x.astype(self.dtype), det)
        li = 0
        exp = 8
        for si, stage in enumerate(self.cfgs):
            for k, exp, c, se, s in stage:
                mid = _make_divisible(exp * self.width)
                out = _make_divisible(c * self.width)
                in_chs = x.shape[-1]
                nm = f"b{si}_{li}"
                y = RepGhostModule(mid, name=f"{nm}_ghost1",
                                   **p)(x, det)
                if s > 1:
                    y = _ConvBn(mid, k, s, groups=mid, act=False,
                                name=f"{nm}_dw", **p)(y, det)
                if se:
                    rd = _make_divisible(mid * se)
                    t = jnp.mean(y, axis=(1, 2), keepdims=True)
                    t = nn.relu(nn.Conv(rd, (1, 1), name=f"{nm}_se_r",
                                        **p)(t))
                    t = nn.Conv(mid, (1, 1), name=f"{nm}_se_e", **p)(t)
                    y = y * jnp.clip(
                        t.astype(jnp.float32) / 6 + 0.5, 0, 1
                    ).astype(y.dtype)
                y = RepGhostModule(out, act=False, name=f"{nm}_ghost2",
                                   **p)(y, det)
                if in_chs == out and s == 1:
                    x = x + y
                else:
                    sc = _ConvBn(in_chs, k, s, groups=in_chs, act=False,
                                 name=f"{nm}_short_dw", **p)(x, det)
                    sc = _ConvBn(out, act=False, name=f"{nm}_short_pw",
                                 **p)(sc, det)
                    x = sc + y
                li += 1
        x = _ConvBn(_make_divisible(exp * self.width), name="final_conv",
                    **p)(x, det)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(1280, name="conv_head", **p)(x))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="classifier",
                        **p)(x).astype(jnp.float32)


def _repghost(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return RepGhostNet(**merged)

    return build


_VARIANTS = {
    "repghostnet_050": dict(width=0.5),
    "repghostnet_058": dict(width=0.58),
    "repghostnet_080": dict(width=0.8),
    "repghostnet_100": dict(width=1.0),
    "repghostnet_111": dict(width=1.11),
    "repghostnet_130": dict(width=1.3),
    "repghostnet_150": dict(width=1.5),
    "repghostnet_200": dict(width=2.0),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _repghost(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"RepGhostNet variant {_name!r} (reference repghost.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
