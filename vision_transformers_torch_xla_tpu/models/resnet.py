"""ResNet family (v1.5) in Flax, NHWC — full registry surface.

Parity with the reference's dormant resnet.py (2213 LoC; registrations
:1404-2165): basic and bottleneck blocks with the stride-on-3x3 (v1.5)
layout, ResNeXt cardinality/base-width, SE (incl. the ResNet-RS 0.25
ratio) and ECA channel attention, deep/'t'(tiered)/'c'/'s' stems with
configurable stem width, avg-pool 'd' downsample, anti-aliased stride
('aa' avg-pool and 'blur' binomial-filter variants), ResNet-RS
(replace_stem_pool), GroupNorm resnet50_gn, wide/width variants, senet154,
and the mixed-block test_resnet.  `*_pruned` names build the unpruned
arch; pruning recipes apply at pretrained-load time (models/prune.py).

Exercises the framework's mutable-collection path (BatchNorm batch_stats
threaded through TrainState.model_state) — under a sharded jit the batch
statistics are computed over the GLOBAL batch, i.e. sync-BN for free.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _blur_pool(x, stride: int = 2):
    """Fixed binomial 3x3 anti-aliasing filter + stride (BlurPool2d)."""
    k = jnp.array([1.0, 2.0, 1.0], dtype=x.dtype)
    k2 = (k[:, None] * k[None, :]) / 16.0
    c = x.shape[-1]
    kernel = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _aa(x, kind, stride):
    if stride == 1 or not kind:
        return x
    if kind == "blur":
        return _blur_pool(x, stride)
    return nn.avg_pool(x, (2, 2), strides=(stride, stride), padding="SAME")


def _attn(y, kind, se_ratio, dtype, param_dtype, prefix):
    """SE or ECA channel attention under the calling compact scope."""
    if not kind:
        return y
    c = y.shape[-1]
    s = jnp.mean(y, axis=(1, 2), keepdims=True)
    if kind == "se":
        rd = max(int(c * se_ratio), 8)
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


class _BN(nn.Module):
    """BatchNorm or GroupNorm(32) per the model's norm flag."""
    norm: str = "bn"
    deterministic: bool = True
    zero_init: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros_init() if self.zero_init else \
            nn.initializers.ones_init()
        if self.norm == "gn":
            return nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                scale_init=init, name="norm")(x)
        return nn.BatchNorm(use_running_average=self.deterministic,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, scale_init=init,
                            name="norm")(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    avg_down: bool = False
    attn: str = ""
    se_ratio: float = 1 / 16
    aa: str = ""
    norm: str = "bn"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(_BN, norm=self.norm, deterministic=deterministic,
                     dtype=self.dtype, param_dtype=self.param_dtype)
        out = self.features
        conv_stride = 1 if self.aa else self.stride
        shortcut = x
        if x.shape[-1] != out or self.stride > 1:
            if self.avg_down and self.stride > 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2),
                                       padding="SAME",
                                       count_include_pad=False)  # ceil_mode parity (odd grids, e.g. 176px)
                shortcut = conv(out, (1, 1),
                                name="downsample_conv")(shortcut)
            else:
                shortcut = conv(out, (1, 1), strides=self.stride,
                                name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        y = conv(out, (3, 3), strides=conv_stride,
                 padding=((1, 1), (1, 1)), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = _aa(y, self.aa, self.stride)
        y = conv(out, (3, 3), padding=((1, 1), (1, 1)), name="conv2")(y)
        y = bn(name="bn2", zero_init=True)(y)
        y = _attn(y, self.attn, self.se_ratio, self.dtype,
                  self.param_dtype, "attn")
        return nn.relu(y + shortcut)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    cardinality: int = 1
    base_width: int = 64
    avg_down: bool = False
    attn: str = ""
    se_ratio: float = 1 / 16
    aa: str = ""
    norm: str = "bn"
    expansion: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(_BN, norm=self.norm, deterministic=deterministic,
                     dtype=self.dtype, param_dtype=self.param_dtype)
        width = int(self.features * (self.base_width / 64)) \
            * self.cardinality
        out_features = self.features * self.expansion
        conv_stride = 1 if self.aa else self.stride
        shortcut = x
        if x.shape[-1] != out_features or self.stride > 1:
            if self.avg_down and self.stride > 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2),
                                       padding="SAME",
                                       count_include_pad=False)  # ceil_mode parity (odd grids, e.g. 176px)
                shortcut = conv(out_features, (1, 1),
                                name="downsample_conv")(shortcut)
            else:
                shortcut = conv(out_features, (1, 1), strides=self.stride,
                                name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        y = conv(width, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(width, (3, 3), strides=conv_stride,
                 padding=((1, 1), (1, 1)),
                 feature_group_count=self.cardinality, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = _aa(y, self.aa, self.stride)
        y = conv(out_features, (1, 1), name="conv3")(y)
        y = bn(name="bn3", zero_init=True)(y)
        y = _attn(y, self.attn, self.se_ratio, self.dtype,
                  self.param_dtype, "attn")
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"            # 'basic' | 'bottleneck'
    block_types: Optional[Tuple[str, ...]] = None  # per-stage override
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    num_classes: int = 1000
    width: int = 64                      # inplanes (stem output)
    stem_width: int = 32                 # deep-stem conv widths
    cardinality: int = 1
    base_width: int = 64
    stem_type: str = ""                  # '' | 'deep' | 'deep_tiered'
    avg_down: bool = False
    replace_stem_pool: bool = False      # ResNet-RS: conv s2 + bn, no max
    attn: str = ""                       # '' | 'se' | 'eca'
    se_ratio: float = 1 / 16
    aa: str = ""                         # '' | 'avg' | 'blur'
    norm: str = "bn"                     # 'bn' | 'gn'
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(_BN, norm=self.norm, deterministic=deterministic,
                     dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.stem_type.startswith("deep"):
            sw = self.stem_width
            if self.stem_type == "deep_tiered":
                plan = (3 * sw // 4, sw)
            else:
                plan = (sw, sw)
            x = nn.relu(bn(name="stem_bn1")(conv(
                plan[0], (3, 3), strides=2, padding=((1, 1), (1, 1)),
                name="stem_conv1")(x)))
            x = nn.relu(bn(name="stem_bn2")(conv(
                plan[1], (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv2")(x)))
            x = nn.relu(bn(name="stem_bn3")(conv(
                self.width, (3, 3), padding=((1, 1), (1, 1)),
                name="stem_conv3")(x)))
        else:
            x = conv(self.width, (7, 7), strides=2,
                     padding=[(3, 3), (3, 3)], name="stem_conv")(x)
            x = nn.relu(bn(name="stem_bn")(x))
        if self.replace_stem_pool:
            x = conv(self.width, (3, 3), strides=2,
                     padding=((1, 1), (1, 1)), name="stem_pool_conv")(x)
            x = nn.relu(bn(name="stem_pool_bn")(x))
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            bt = self.block_types[stage] if self.block_types else self.block
            for blk in range(n_blocks):
                kwargs = dict(stride=2 if stage > 0 and blk == 0 else 1,
                              avg_down=self.avg_down, attn=self.attn,
                              se_ratio=self.se_ratio, aa=self.aa,
                              norm=self.norm, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"stages_{stage}_blocks_{blk}")
                feats = self.channels[stage]
                if bt == "basic":
                    x = BasicBlock(feats, **kwargs)(x, deterministic)
                else:
                    x = Bottleneck(feats, cardinality=self.cardinality,
                                   base_width=self.base_width,
                                   **kwargs)(x, deterministic)
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{stage}", x)
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
_T = dict(stem_type="deep_tiered", avg_down=True)
_RS = dict(stem_type="deep", avg_down=True, replace_stem_pool=True,
           attn="se", se_ratio=0.25)
_X4 = dict(cardinality=32, base_width=4)
_VARIANTS = {
    # plain + d (reference resnet.py:1404-1638)
    "resnet10t": dict(stage_sizes=(1, 1, 1, 1), block="basic", **_T),
    "resnet14t": dict(stage_sizes=(1, 1, 1, 1), **_T),
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block="basic"),
    "resnet18d": dict(stage_sizes=(2, 2, 2, 2), block="basic", **_D),
    "resnet26": dict(stage_sizes=(2, 2, 2, 2)),
    "resnet26t": dict(stage_sizes=(2, 2, 2, 2), **_T),
    "resnet26d": dict(stage_sizes=(2, 2, 2, 2), **_D),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block="basic"),
    "resnet34d": dict(stage_sizes=(3, 4, 6, 3), block="basic", **_D),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3)),
    "resnet50c": dict(stage_sizes=(3, 4, 6, 3), stem_type="deep"),
    "resnet50d": dict(stage_sizes=(3, 4, 6, 3), **_D),
    "resnet50s": dict(stage_sizes=(3, 4, 6, 3), stem_type="deep",
                      stem_width=64),
    "resnet50t": dict(stage_sizes=(3, 4, 6, 3), **_T),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3)),
    "resnet101c": dict(stage_sizes=(3, 4, 23, 3), stem_type="deep"),
    "resnet101d": dict(stage_sizes=(3, 4, 23, 3), **_D),
    "resnet101s": dict(stage_sizes=(3, 4, 23, 3), stem_type="deep",
                       stem_width=64),
    "resnet152": dict(stage_sizes=(3, 8, 36, 3)),
    "resnet152c": dict(stage_sizes=(3, 8, 36, 3), stem_type="deep"),
    "resnet152d": dict(stage_sizes=(3, 8, 36, 3), **_D),
    "resnet152s": dict(stage_sizes=(3, 8, 36, 3), stem_type="deep",
                       stem_width=64),
    "resnet200": dict(stage_sizes=(3, 24, 36, 3)),
    "resnet200d": dict(stage_sizes=(3, 24, 36, 3), **_D),
    "resnet50_gn": dict(stage_sizes=(3, 4, 6, 3), norm="gn"),
    # resnext (:1646-1700)
    "resnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), **_X4),
    "resnext50d_32x4d": dict(stage_sizes=(3, 4, 6, 3), **_X4, **_D),
    "resnext101_32x4d": dict(stage_sizes=(3, 4, 23, 3), **_X4),
    "resnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                             base_width=8),
    "resnext101_32x16d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                              base_width=16),
    "resnext101_32x32d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                              base_width=32),
    "resnext101_64x4d": dict(stage_sizes=(3, 4, 23, 3), cardinality=64,
                             base_width=4),
    "wide_resnet50_2": dict(stage_sizes=(3, 4, 6, 3), base_width=128),
    "wide_resnet101_2": dict(stage_sizes=(3, 4, 23, 3), base_width=128),
    # eca (:1705-1820)
    "ecaresnet26t": dict(stage_sizes=(2, 2, 2, 2), attn="eca", **_T),
    "ecaresnet50d": dict(stage_sizes=(3, 4, 6, 3), attn="eca", **_D),
    "ecaresnet50d_pruned": dict(stage_sizes=(3, 4, 6, 3), attn="eca",
                                **_D),
    "ecaresnet50t": dict(stage_sizes=(3, 4, 6, 3), attn="eca", **_T),
    "ecaresnetlight": dict(stage_sizes=(1, 1, 11, 3), attn="eca",
                           avg_down=True),
    "ecaresnet101d": dict(stage_sizes=(3, 4, 23, 3), attn="eca", **_D),
    "ecaresnet101d_pruned": dict(stage_sizes=(3, 4, 23, 3), attn="eca",
                                 **_D),
    "ecaresnet200d": dict(stage_sizes=(3, 24, 36, 3), attn="eca", **_D),
    "ecaresnet269d": dict(stage_sizes=(3, 30, 48, 8), attn="eca", **_D),
    "ecaresnext26t_32x4d": dict(stage_sizes=(2, 2, 2, 2), **_X4,
                                attn="eca", **_T),
    "ecaresnext50t_32x4d": dict(stage_sizes=(2, 2, 2, 2), **_X4,
                                attn="eca", **_T),
    # se (:1825-1960)
    "seresnet18": dict(stage_sizes=(2, 2, 2, 2), block="basic",
                       attn="se"),
    "seresnet34": dict(stage_sizes=(3, 4, 6, 3), block="basic",
                       attn="se"),
    "seresnet50": dict(stage_sizes=(3, 4, 6, 3), attn="se"),
    "seresnet50t": dict(stage_sizes=(3, 4, 6, 3), attn="se", **_T),
    "seresnet101": dict(stage_sizes=(3, 4, 23, 3), attn="se"),
    "seresnet152": dict(stage_sizes=(3, 8, 36, 3), attn="se"),
    "seresnet152d": dict(stage_sizes=(3, 8, 36, 3), attn="se", **_D),
    "seresnet200d": dict(stage_sizes=(3, 24, 36, 3), attn="se", **_D),
    "seresnet269d": dict(stage_sizes=(3, 30, 48, 8), attn="se", **_D),
    "seresnext26d_32x4d": dict(stage_sizes=(2, 2, 2, 2), **_X4,
                               attn="se", **_D),
    "seresnext26t_32x4d": dict(stage_sizes=(2, 2, 2, 2), **_X4,
                               attn="se", **_T),
    "seresnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), **_X4,
                              attn="se"),
    "seresnext101_32x4d": dict(stage_sizes=(3, 4, 23, 3), **_X4,
                               attn="se"),
    "seresnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                               base_width=8, attn="se"),
    "seresnext101d_32x8d": dict(stage_sizes=(3, 4, 23, 3), cardinality=32,
                                base_width=8, attn="se", **_D),
    "seresnext101_64x4d": dict(stage_sizes=(3, 4, 23, 3), cardinality=64,
                               base_width=4, attn="se"),
    "senet154": dict(stage_sizes=(3, 8, 36, 3), cardinality=64,
                     base_width=4, stem_type="deep", attn="se"),
    # anti-aliased (:1963-2063)
    "resnetblur18": dict(stage_sizes=(2, 2, 2, 2), block="basic",
                         aa="blur"),
    "resnetblur50": dict(stage_sizes=(3, 4, 6, 3), aa="blur"),
    "resnetblur50d": dict(stage_sizes=(3, 4, 6, 3), aa="blur", **_D),
    "resnetblur101d": dict(stage_sizes=(3, 4, 23, 3), aa="blur", **_D),
    "resnetaa34d": dict(stage_sizes=(3, 4, 6, 3), block="basic",
                        aa="avg", **_D),
    "resnetaa50": dict(stage_sizes=(3, 4, 6, 3), aa="avg"),
    "resnetaa50d": dict(stage_sizes=(3, 4, 6, 3), aa="avg", **_D),
    "resnetaa101d": dict(stage_sizes=(3, 4, 23, 3), aa="avg", **_D),
    "seresnetaa50d": dict(stage_sizes=(3, 4, 6, 3), aa="avg", attn="se",
                          **_D),
    "seresnextaa101d_32x8d": dict(stage_sizes=(3, 4, 23, 3),
                                  cardinality=32, base_width=8, aa="avg",
                                  attn="se", **_D),
    "seresnextaa201d_32x8d": dict(stage_sizes=(3, 24, 36, 4),
                                  cardinality=32, base_width=8, aa="avg",
                                  attn="se", stem_type="deep",
                                  stem_width=64, avg_down=True),
    # ResNet-RS (:2068-2158)
    "resnetrs50": dict(stage_sizes=(3, 4, 6, 3), **_RS),
    "resnetrs101": dict(stage_sizes=(3, 4, 23, 3), **_RS),
    "resnetrs152": dict(stage_sizes=(3, 8, 36, 3), **_RS),
    "resnetrs200": dict(stage_sizes=(3, 24, 36, 3), **_RS),
    "resnetrs270": dict(stage_sizes=(4, 29, 53, 4), **_RS),
    "resnetrs350": dict(stage_sizes=(4, 36, 72, 4), **_RS),
    "resnetrs420": dict(stage_sizes=(4, 44, 87, 4), **_RS),
    # mixed-block test config (:2160-2165)
    "test_resnet": dict(stage_sizes=(1, 1, 1, 1),
                        block_types=("basic", "basic", "bottleneck",
                                     "basic"),
                        channels=(32, 48, 48, 96), stem_width=16, **_D),
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
