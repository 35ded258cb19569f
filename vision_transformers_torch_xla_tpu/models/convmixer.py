"""ConvMixer in Flax, NHWC.

Parity with the reference's dormant convmixer.py (145 LoC): patch embed
conv, then depth x (depthwise conv + residual, pointwise conv), GELU + BN
throughout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class ConvMixer(nn.Module):
    dim: int = 768
    depth: int = 32
    kernel_size: int = 7
    patch_size: int = 7
    num_classes: int = 1000
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = conv(self.dim, (self.patch_size, self.patch_size),
                 strides=self.patch_size, name="stem")(x)
        x = bn(name="stem_bn")(nn.gelu(x, approximate=True))
        for i in range(self.depth):
            y = conv(self.dim, (self.kernel_size, self.kernel_size),
                     padding="SAME", feature_group_count=self.dim,
                     name=f"blocks_{i}_dw")(x)
            y = bn(name=f"blocks_{i}_bn1")(nn.gelu(y, approximate=True))
            x = x + y
            x = conv(self.dim, (1, 1), name=f"blocks_{i}_pw")(x)
            x = bn(name=f"blocks_{i}_bn2")(nn.gelu(x, approximate=True))
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _convmixer(_dim, _depth, _k, _p, **kw):
    for key in ("pretrained_tag", "global_pool", "init_values", "remat",
                "scan_blocks", "drop_path_rate"):
        kw.pop(key, None)
    kw.setdefault("dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("kernel_size", _k)
    kw.setdefault("patch_size", _p)
    return ConvMixer(**kw)


@register_model
def convmixer_768_32(**kw):
    return _convmixer(768, 32, 7, 7, **kw)


@register_model
def convmixer_1024_20_ks9_p14(**kw):
    return _convmixer(1024, 20, 9, 14, **kw)


@register_model
def convmixer_1536_20(**kw):
    return _convmixer(1536, 20, 9, 7, **kw)
