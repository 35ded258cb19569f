"""PVTv2: Pyramid Vision Transformer with spatial-reduction attention.

Parity with the reference's dormant pvt_v2.py (560 LoC): 4 pyramid stages,
overlapping patch embeds (strided convs), linear-complexity attention via
spatial reduction (strided conv on K/V), and a depthwise conv inside the MLP.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import _layer_norm, drop_path, trunc_init
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.ops.attention import multi_head_attention

__all__ = []


class SRAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    linear: bool = False   # b2_li: pooled 7x7 KV (reference pvt_v2 linear)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple) -> jax.Array:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        q = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("embed", "qkv_out")), name="q")(x)
        kv_in = x
        if self.linear:
            # linear-complexity SR: adaptive 7x7 avg pool + 1x1 conv +
            # LN + GELU (reference pvt_v2.py linear attention path)
            grid = x.reshape(b, hw[0], hw[1], c)
            ph, pw = max(1, hw[0] // 7), max(1, hw[1] // 7)
            grid = nn.avg_pool(grid, (ph, pw), strides=(ph, pw))
            grid = nn.Conv(c, (1, 1), dtype=self.dtype,
                           param_dtype=self.param_dtype, name="sr")(grid)
            kv_in = grid.reshape(b, -1, c)
            kv_in = _layer_norm(self.dtype, self.param_dtype,
                                "sr_norm")(kv_in)
            kv_in = nn.gelu(kv_in, approximate=True)
        elif self.sr_ratio > 1:
            grid = x.reshape(b, hw[0], hw[1], c)
            grid = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                           strides=self.sr_ratio, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="sr")(grid)
            kv_in = grid.reshape(b, -1, c)
            kv_in = _layer_norm(self.dtype, self.param_dtype, "sr_norm")(kv_in)
        kv = nn.Dense(2 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                      kernel_init=nn.with_logical_partitioning(
                          trunc_init, ("embed", "qkv_out")), name="kv")(kv_in)
        m = kv_in.shape[1]
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, hd).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v, scale=hd ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")), name="proj")(o)


class PvtBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    sr_ratio: int
    linear: bool = False
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple,
                 deterministic: bool = True) -> jax.Array:
        y = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                        linear=self.linear, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="attn")(
            _layer_norm(self.dtype, self.param_dtype, "norm1")(x), hw)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)

        # MLP with depthwise conv (PVTv2 signature design)
        y = _layer_norm(self.dtype, self.param_dtype, "norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("embed", "mlp")), name="fc1")(y)
        b, n, c = y.shape
        grid = y.reshape(b, hw[0], hw[1], c)
        if self.linear:
            # reference pvt_v2.py:49,59: extra_relu before the depthwise
            # conv in the linear-attention variants (pvt_v2_b2_li)
            grid = nn.relu(grid)
        grid = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="dwconv")(grid)
        y = nn.gelu(grid.reshape(b, n, c), approximate=True)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("mlp", "embed")), name="fc2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class PvtV2(nn.Module):
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (32, 64, 160, 256)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[float] = (8.0, 8.0, 4.0, 4.0)
    linear: bool = False
    num_classes: int = 1000
    drop_path_rate: float = 0.1
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        import numpy as np

        x = x.astype(self.dtype)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for si, (depth, dim, heads, sr, mr) in enumerate(zip(
                self.depths, self.dims, self.num_heads, self.sr_ratios,
                self.mlp_ratios)):
            # overlapping patch embed: 7/4 first stage, 3/2 after
            k, s = (7, 4) if si == 0 else (3, 2)
            x = nn.Conv(dim, (k, k), strides=s, padding="SAME",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"patch_embed_{si}")(x)
            b, hh, ww, c = x.shape
            x = x.reshape(b, hh * ww, c)
            x = _layer_norm(self.dtype, self.param_dtype,
                            f"embed_norm_{si}")(x)
            for blk in range(depth):
                x = PvtBlock(dim, heads, mr, sr, self.linear,
                             float(dpr[cur + blk]),
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"stages_{si}_blocks_{blk}")(
                    x, (hh, ww), deterministic)
            cur += depth
            x = _layer_norm(self.dtype, self.param_dtype,
                            f"stage_norm_{si}")(x)
            # stage-boundary feature tap (models/features.py): spatial grid
            self.sow("intermediates", f"stage_{si}",
                     x.reshape(b, hh, ww, c))
            if si < len(self.depths) - 1:
                x = x.reshape(b, hh, ww, c)
        x = x.mean(axis=1)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _pvt2(_depths, _dims, **kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks"):
        kw.pop(k, None)
    kw.setdefault("depths", _depths)
    kw.setdefault("dims", _dims)
    return PvtV2(**kw)


@register_model
def pvt_v2_b0(**kw):
    return _pvt2((2, 2, 2, 2), (32, 64, 160, 256), **kw)


@register_model
def pvt_v2_b1(**kw):
    return _pvt2((2, 2, 2, 2), (64, 128, 320, 512), **kw)


@register_model
def pvt_v2_b2(**kw):
    return _pvt2((3, 4, 6, 3), (64, 128, 320, 512), **kw)


@register_model
def pvt_v2_b2_li(**kw):
    return _pvt2((3, 4, 6, 3), (64, 128, 320, 512), linear=True, **kw)


@register_model
def pvt_v2_b3(**kw):
    return _pvt2((3, 4, 18, 3), (64, 128, 320, 512), **kw)


@register_model
def pvt_v2_b4(**kw):
    return _pvt2((3, 8, 27, 3), (64, 128, 320, 512), **kw)


@register_model
def pvt_v2_b5(**kw):
    kw.setdefault("mlp_ratios", (4.0, 4.0, 4.0, 4.0))
    return _pvt2((3, 6, 40, 3), (64, 128, 320, 512), **kw)
