"""ResNet family (v1.5) in Flax, NHWC.

Parity with the reference's dormant resnet.py (2213 LoC; SURVEY §2.2):
basic and bottleneck blocks with the stride-on-3x3 (v1.5) layout,
ResNeXt cardinality/base-width, SE and ECA channel attention, 'd'
variants (deep 3x3x3 stem + avg-pool downsample), tiered stems, and
wide variants — the reference's main registry surface minus the
byobnet-style exotics. Exercises the framework's mutable-collection
path (BatchNorm batch_stats threaded through TrainState.model_state) —
under a sharded jit the batch statistics are computed over the GLOBAL
batch, i.e. sync-BN for free.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _attn(y, kind, dtype, param_dtype, prefix):
    """SE (reduce 1/16) or ECA (1D conv over channel descriptor).
    Submodules are registered under the calling block's compact scope."""
    if not kind:
        return y
    c = y.shape[-1]
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    if kind == "se":
        rd = max(c // 16, 8)
        s = nn.relu(nn.Conv(rd, (1, 1), dtype=dtype,
                            param_dtype=param_dtype,
                            name=f"{prefix}_se_reduce")(s))
        s = nn.Conv(c, (1, 1), dtype=dtype, param_dtype=param_dtype,
                    name=f"{prefix}_se_expand")(s)
    else:  # eca: adaptive-kernel 1D conv across channels
        t = int(abs((math.log2(c) + 1) / 2))
        k = max(t if t % 2 else t + 1, 3)
        s = s.reshape(s.shape[0], c, 1)
        s = nn.Conv(1, (k,), padding=((k // 2, k // 2),),
                    use_bias=False, dtype=dtype,
                    param_dtype=param_dtype,
                    name=f"{prefix}_eca_conv")(s)
        s = s.reshape(s.shape[0], 1, 1, c)
    return y * jax.nn.sigmoid(s.astype(jnp.float32)).astype(y.dtype)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    avg_down: bool = False
    attn: str = ""
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        out = self.features
        shortcut = x
        if x.shape[-1] != out or self.stride > 1:
            if self.avg_down and self.stride > 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
                shortcut = conv(out, (1, 1), name="downsample_conv")(shortcut)
            else:
                shortcut = conv(out, (1, 1), strides=self.stride,
                                name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        y = conv(out, (3, 3), strides=self.stride,
                 padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(out, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = bn(name="bn2", scale_init=nn.initializers.zeros_init())(y)
        y = _attn(y, self.attn, self.dtype, self.param_dtype, "attn")
        return nn.relu(y + shortcut)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    avg_down: bool = False
    attn: str = ""
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        width = int(self.features * (self.base_width / 64)) * self.cardinality
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
        y = conv(width, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(width, (3, 3), strides=self.stride,
                 padding=((1, 1), (1, 1)),
                 feature_group_count=self.cardinality, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = conv(out_features, (1, 1), name="conv3")(y)
        y = bn(name="bn3", scale_init=nn.initializers.zeros_init())(y)
        y = _attn(y, self.attn, self.dtype, self.param_dtype, "attn")
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"            # 'basic' | 'bottleneck'
    num_classes: int = 1000
    width: int = 64
    cardinality: int = 1
    base_width: int = 64
    stem_type: str = ""                  # '' | 'deep' | 'deep_tiered'
    avg_down: bool = False
    attn: str = ""                       # '' | 'se' | 'eca'
    img_size: int = 224  # factory parity; fully convolutional
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
        if self.stem_type.startswith("deep"):
            mid = (3 * self.width // 8 if self.stem_type == "deep_tiered"
                   else self.width // 2)
            x = nn.relu(bn(name="stem_bn1")(conv(
                mid, (3, 3), strides=2, padding=((1, 1), (1, 1)),
                name="stem_conv1")(x)))
            x = nn.relu(bn(name="stem_bn2")(conv(
                mid if self.stem_type == "deep" else self.width // 2,
                (3, 3), padding=((1, 1), (1, 1)), name="stem_conv2")(x)))
            x = nn.relu(bn(name="stem_bn3")(conv(
                self.width, (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv3")(x)))
        else:
            x = conv(self.width, (7, 7), strides=2,
                     padding=[(3, 3), (3, 3)], name="stem_conv")(x)
            x = nn.relu(bn(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        for stage, n_blocks in enumerate(self.stage_sizes):
            for blk in range(n_blocks):
                kwargs = dict(stride=2 if stage > 0 and blk == 0 else 1,
                              avg_down=self.avg_down, attn=self.attn,
                              dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"stages_{stage}_blocks_{blk}")
                feats = self.width * (2 ** stage)
                if self.block == "basic":
                    x = BasicBlock(feats, **kwargs)(x, deterministic)
                else:
                    x = Bottleneck(feats, cardinality=self.cardinality,
                                   base_width=self.base_width,
                                   **kwargs)(x, deterministic)
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
        return ResNet(**merged)

    return build


_D = dict(stem_type="deep", avg_down=True)
_VARIANTS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block="basic"),
    "resnet18d": dict(stage_sizes=(2, 2, 2, 2), block="basic", **_D),
    "resnet26": dict(stage_sizes=(2, 2, 2, 2)),
    "resnet26d": dict(stage_sizes=(2, 2, 2, 2), **_D),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block="basic"),
    "resnet34d": dict(stage_sizes=(3, 4, 6, 3), block="basic", **_D),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3)),
    "resnet50d": dict(stage_sizes=(3, 4, 6, 3), **_D),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3)),
    "resnet101d": dict(stage_sizes=(3, 4, 23, 3), **_D),
    "resnet152": dict(stage_sizes=(3, 8, 36, 3)),
    "resnet152d": dict(stage_sizes=(3, 8, 36, 3), **_D),
    "resnet200d": dict(stage_sizes=(3, 24, 36, 3), **_D),
    "resnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), cardinality=32,
                            base_width=4),
    "resnext50d_32x4d": dict(stage_sizes=(3, 4, 6, 3), cardinality=32,
                             base_width=4, **_D),
    "resnext101_32x4d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                             base_width=4),
    "resnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                             base_width=8),
    "resnext101_64x4d": dict(stage_sizes=(3, 4, 23, 3), cardinality=64,
                             base_width=4),
    "wide_resnet50_2": dict(stage_sizes=(3, 4, 6, 3), base_width=128),
    "wide_resnet101_2": dict(stage_sizes=(3, 4, 23, 3), base_width=128),
    "seresnet50": dict(stage_sizes=(3, 4, 6, 3), attn="se"),
    "seresnet101": dict(stage_sizes=(3, 4, 23, 3), attn="se"),
    "seresnet152d": dict(stage_sizes=(3, 8, 36, 3), attn="se", **_D),
    "seresnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), cardinality=32,
                              base_width=4, attn="se"),
    "seresnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                               base_width=8, attn="se"),
    "ecaresnet50d": dict(stage_sizes=(3, 4, 6, 3), attn="eca", **_D),
    "ecaresnet101d": dict(stage_sizes=(3, 4, 23, 3), attn="eca", **_D),
    "ecaresnet269d": dict(stage_sizes=(3, 30, 48, 8), attn="eca", **_D),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _make(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"ResNet-family variant {_name!r} (reference resnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
