"""ResNet (v1.5) in Flax, NHWC.

Parity with the reference's dormant resnet.py (2213 LoC; SURVEY §2.2):
classic bottleneck ResNets with the standard stride-on-3x3 (v1.5) layout.
Exercises the framework's mutable-collection path (BatchNorm batch_stats
threaded through TrainState.model_state) — under a sharded jit the batch
statistics are computed over the GLOBAL batch, i.e. sync-BN for free.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        out_features = self.features * 4
        shortcut = x
        if x.shape[-1] != out_features or self.stride > 1:
            shortcut = conv(out_features, (1, 1), strides=self.stride,
                            name="downsample_conv")(x)
            shortcut = bn(name="downsample_bn")(shortcut)
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.features, (3, 3), strides=self.stride, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = conv(out_features, (1, 1), name="conv3")(y)
        y = bn(name="bn3", scale_init=nn.initializers.zeros_init())(y)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 1000
    width: int = 64
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            for blk in range(n_blocks):
                x = Bottleneck(self.width * (2 ** stage),
                               stride=2 if stage > 0 and blk == 0 else 1,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name=f"stages_{stage}_blocks_{blk}")(x, deterministic)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _resnet(stages, **kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks", "drop_path_rate"):
        kw.pop(k, None)
    return ResNet(stage_sizes=stages, **kw)


@register_model
def resnet50(**kw):
    return _resnet((3, 4, 6, 3), **kw)


@register_model
def resnet101(**kw):
    return _resnet((3, 4, 23, 3), **kw)


@register_model
def resnet152(**kw):
    return _resnet((3, 8, 36, 3), **kw)
