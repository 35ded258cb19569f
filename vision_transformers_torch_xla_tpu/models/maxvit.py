"""MaxViT: MBConv + block attention + grid attention, in Flax NHWC.

Parity with the reference's dormant maxxvit.py (2638 LoC): each stage
alternates (MBConv, window 'block' attention over local PxP tiles, 'grid'
attention over strided PxP grids). Block/grid partitioning are pure
reshapes/transposes (TPU-friendly); attention cores run through the shared
ops. Relative position bias is omitted in this first cut (noted gap).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    _dense,
    _layer_norm,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.ops.attention import multi_head_attention

__all__ = []

_P = 7  # partition size for block/grid attention


def _block_partition(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, p * p, c)


def _block_merge(x, p, h, w):
    b = x.shape[0] // ((h // p) * (w // p))
    x = x.reshape(b, h // p, w // p, p, p, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _grid_partition(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, p, h // p, p, w // p, c)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, p * p, c)


def _grid_merge(x, p, h, w):
    b = x.shape[0] // ((h // p) * (w // p))
    x = x.reshape(b, h // p, w // p, p, p, -1)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, -1)


class _PartitionAttention(nn.Module):
    dim: int
    num_heads: int
    grid: bool  # False: block attention; True: grid attention
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        h = self.num_heads
        hd = c // h
        part, merge = (_grid_partition, _grid_merge) if self.grid else \
            (_block_partition, _block_merge)
        shortcut = x
        y = _layer_norm(self.dtype, self.param_dtype, "norm1")(x)
        y = part(y, _P)                                    # (B*, P^2, C)
        nb, n, _ = y.shape
        qkv = _dense(3 * c, ("embed", "qkv_out"), True, self.dtype,
                     self.param_dtype, "qkv")(y)
        qkv = qkv.reshape(nb, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        o = multi_head_attention(qkv[0], qkv[1], qkv[2], scale=hd ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(nb, n, c)
        o = _dense(c, ("qkv_out", "embed"), True, self.dtype,
                   self.param_dtype, "proj")(o)
        o = merge(o, _P, hh, ww)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(o, self.drop_path_rate, deterministic, rng)

        y = _layer_norm(self.dtype, self.param_dtype, "norm2")(x)
        y = Mlp(4 * c, c, dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class _MBConv(nn.Module):
    out_ch: int
    stride: int = 1
    expand: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        mid = x.shape[-1] * self.expand
        shortcut = x
        y = nn.silu(bn(name="bn0")(x))
        y = nn.silu(bn(name="bn1")(conv(mid, (1, 1), name="conv_exp")(y)))
        y = conv(mid, (3, 3), strides=self.stride, padding="SAME",
                 feature_group_count=mid, name="conv_dw")(y)
        y = nn.silu(bn(name="bn2")(y))
        se_ch = max(1, mid // 16)
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(se_ch, (1, 1), dtype=self.dtype,
                            param_dtype=self.param_dtype, name="se_r")(s))
        s = nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype,
                               param_dtype=self.param_dtype, name="se_e")(s))
        y = conv(self.out_ch, (1, 1), name="conv_proj")(y * s)
        if self.stride > 1 or shortcut.shape[-1] != self.out_ch:
            if self.stride > 1:
                shortcut = nn.avg_pool(shortcut, (2, 2), strides=(2, 2))
            shortcut = conv(self.out_ch, (1, 1), name="short_conv")(shortcut)
        return shortcut + y


class MaxVit(nn.Module):
    depths: Sequence[int] = (2, 2, 5, 2)
    dims: Sequence[int] = (64, 128, 256, 512)
    stem_dim: int = 64
    num_classes: int = 1000
    head_dim: int = 32
    drop_path_rate: float = 0.2
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = conv(self.stem_dim, (3, 3), strides=2, padding="SAME",
                 use_bias=False, name="stem_conv1")(x)
        x = nn.silu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="stem_bn")(x))
        x = conv(self.stem_dim, (3, 3), padding="SAME", name="stem_conv2")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            heads = max(1, dim // self.head_dim)
            for bi in range(depth):
                d = float(dpr[cur + bi])
                x = _MBConv(dim, stride=2 if bi == 0 else 1,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"stages_{si}_blocks_{bi}_mbconv")(
                    x, deterministic)
                x = _PartitionAttention(dim, heads, grid=False,
                                        drop_path_rate=d, dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=f"stages_{si}_blocks_{bi}_blockattn")(
                    x, deterministic)
                x = _PartitionAttention(dim, heads, grid=True,
                                        drop_path_rate=d, dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=f"stages_{si}_blocks_{bi}_gridattn")(
                    x, deterministic)
            cur += depth
        x = x.mean(axis=(1, 2))
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _maxvit(_depths, _dims, _stem, **kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks"):
        kw.pop(k, None)
    kw.setdefault("depths", _depths)
    kw.setdefault("dims", _dims)
    kw.setdefault("stem_dim", _stem)
    return MaxVit(**kw)


@register_model
def maxvit_tiny_224(**kw):
    return _maxvit((2, 2, 5, 2), (64, 128, 256, 512), 64, **kw)


@register_model
def maxvit_small_224(**kw):
    return _maxvit((2, 2, 5, 2), (96, 192, 384, 768), 64, **kw)
