"""SKNet (Selective Kernel ResNets) in Flax, NHWC.

Parity with the reference's dormant sknet.py (240 LoC; SURVEY §2.2):
ResNet blocks whose 3x3 stage is a selective kernel — two parallel 3x3
convs (dilation 1 and 2; timm's split_input halves the input channels
per path), whose summed output drives a squeeze attention that softmaxes
across paths and reweights their sum (SK paper via timm's
SelectiveKernel layer).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _SelectiveKernel(nn.Module):
    features: int
    stride: int = 1
    groups: int = 1
    split_input: bool = True
    rd_ratio: float = 1 / 16
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, **p)
        out = self.features
        if self.split_input:
            half = x.shape[-1] // 2
            inputs = [x[..., :half], x[..., half:]]
        else:
            inputs = [x, x]
        paths = []
        for i, (xin, dil) in enumerate(zip(inputs, (1, 2))):
            y = nn.Conv(out, (3, 3), strides=(self.stride, self.stride),
                        padding=((dil, dil), (dil, dil)),
                        kernel_dilation=(dil, dil),
                        feature_group_count=self.groups, use_bias=False,
                        name=f"path{i}_conv", **p)(xin)
            y = nn.relu(bn(name=f"path{i}_bn")(y))
            paths.append(y)
        stacked = jnp.stack(paths, axis=0)               # (P, B, H, W, C)
        s = jnp.mean(jnp.sum(stacked, axis=0), axis=(1, 2))   # (B, C)
        rd = max(int(out * self.rd_ratio), 32)
        a = nn.relu(bn(name="attn_bn")(nn.Dense(
            rd, use_bias=False, name="attn_fc1", **p)(s)))
        a = nn.Dense(out * 2, name="attn_fc2", **p)(a)
        a = a.reshape(-1, 2, out).transpose(1, 0, 2)     # (P, B, C)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=0).astype(x.dtype)
        return jnp.sum(stacked * a[:, :, None, None, :], axis=0)


class SKNet(nn.Module):
    """SK ResNet trunk (reference sknet.py:22-170 block defs)."""

    num_classes: int = 1000
    layers: Sequence[int] = (2, 2, 2, 2)
    bottleneck: bool = False
    cardinality: int = 1
    base_width: int = 64
    stem_type: str = ""
    avg_down: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv = partial(nn.Conv, use_bias=False, **p)
        bn = partial(nn.BatchNorm, use_running_average=det, momentum=0.9,
                     epsilon=1e-5, **p)
        x = x.astype(self.dtype)
        if self.stem_type == "deep":
            x = nn.relu(bn(name="stem_bn1")(conv(
                32, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                name="stem_conv1")(x)))
            x = nn.relu(bn(name="stem_bn2")(conv(
                32, (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv2")(x)))
            x = nn.relu(bn(name="stem_bn3")(conv(
                64, (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv3")(x)))
        else:
            x = nn.relu(bn(name="stem_bn")(conv(
                64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                name="stem_conv")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for si, depth in enumerate(self.layers):
            width = 64 * (2 ** si)
            out = width * (4 if self.bottleneck else 1)
            for bi in range(depth):
                stride = 2 if si > 0 and bi == 0 else 1
                nm = f"s{si}_b{bi}"
                shortcut = x
                if x.shape[-1] != out or stride > 1:
                    if self.avg_down and stride > 1:
                        shortcut = nn.avg_pool(shortcut, (2, 2),
                                               strides=(2, 2))
                        shortcut = conv(out, (1, 1),
                                        name=f"{nm}_down")(shortcut)
                    else:
                        shortcut = conv(out, (1, 1), strides=stride,
                                        name=f"{nm}_down")(x)
                    shortcut = bn(name=f"{nm}_down_bn")(shortcut)
                if self.bottleneck:
                    mid = int(width * self.base_width / 64) * \
                        self.cardinality
                    y = nn.relu(bn(name=f"{nm}_bn1")(conv(
                        mid, (1, 1), name=f"{nm}_c1")(x)))
                    y = _SelectiveKernel(mid, stride, self.cardinality,
                                         name=f"{nm}_sk", **p)(y, det)
                    y = bn(name=f"{nm}_bn3",
                           scale_init=nn.initializers.zeros_init())(conv(
                               out, (1, 1), name=f"{nm}_c3")(y))
                else:
                    y = _SelectiveKernel(
                        width, stride, split_input=True, rd_ratio=1 / 8,
                        name=f"{nm}_sk", **p)(x, det)
                    y = bn(name=f"{nm}_bn2",
                           scale_init=nn.initializers.zeros_init())(conv(
                               out, (3, 3), padding=((1, 1), (1, 1)),
                               name=f"{nm}_c2")(y))
                x = nn.relu(y + shortcut)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _sknet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size", "drop_path_rate"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return SKNet(**merged)

    return build


_VARIANTS = {
    "skresnet18": dict(layers=(2, 2, 2, 2)),
    "skresnet34": dict(layers=(3, 4, 6, 3)),
    "skresnet50": dict(layers=(3, 4, 6, 3), bottleneck=True),
    "skresnet50d": dict(layers=(3, 4, 6, 3), bottleneck=True,
                        stem_type="deep", avg_down=True),
    "skresnext50_32x4d": dict(layers=(3, 4, 6, 3), bottleneck=True,
                              cardinality=32, base_width=4),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _sknet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"SKNet variant {_name!r} (reference sknet.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
