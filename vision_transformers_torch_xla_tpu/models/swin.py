"""Swin Transformer in Flax, NHWC.

Parity with the reference's dormant swin_transformer.py (1174 LoC; SURVEY
§2.2): window attention with relative position bias, shifted windows with
attention masking, patch merging downsample, pre-LN blocks with stochastic
depth.

TPU notes: window partition/merge are pure reshapes/transposes (free-ish on
TPU); the shifted-window mask and the relative-position index are host
constants baked at trace time (no dynamic shapes); attention runs as batched
MXU matmuls over (B*nW, ws^2, C) with fp32 softmax.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) index into the (2ws-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws^2, ws^2) additive mask (-100 for cross-region pairs)."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = (win[:, :, None] != win[:, None, :]) * -100.0
    return mask.astype(np.float32)


def _window_partition(x: jax.Array, ws: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _window_merge(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        bnw, n, c = x.shape  # (B*nW, ws^2, C)
        h = self.num_heads
        hd = c // h
        ws = self.window_size

        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        table = self.param(
            "rel_pos_bias_table",
            nn.with_logical_partitioning(trunc_init, (None, "heads")),
            ((2 * ws - 1) ** 2, h), self.param_dtype)
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c).astype(x.dtype)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        b, hgt, wid, c = x.shape
        ws = self.window_size
        shift = self.shift
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hgt, wid, ws, shift))
        else:
            mask = None
        y = _window_partition(y, ws)
        y = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="attn")(y, mask)
        y = _window_merge(y, ws, hgt, wid)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(y, self.drop_path_rate, deterministic, rng)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class SwinTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: Sequence[int] = 7    # int or per-stage tuple
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        # 4x4 patchify -> linear (space-to-depth + matmul, MXU-direct)
        hgt, wid = x.shape[1] // p, x.shape[2] // p
        x = x.astype(self.dtype).reshape(b, hgt, p, wid, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hgt, wid, p * p * 3)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("patch", "embed")),
                     name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for stage, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2 ** stage)
            if stage > 0:
                # patch merging: 2x2 space-to-depth + LN + linear to 2*dim
                bh, hh, ww, cc = x.shape
                x = x.reshape(bh, hh // 2, 2, ww // 2, 2, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bh, hh // 2, ww // 2, 4 * cc)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"merge_norm_{stage}")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             kernel_init=nn.with_logical_partitioning(
                                 trunc_init, ("patch", "embed")),
                             name=f"merge_proj_{stage}")(x)
            ws_cfg = (self.window_size[stage]
                      if isinstance(self.window_size, (tuple, list))
                      else self.window_size)
            ws = min(ws_cfg, x.shape[1])
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 or ws >= x.shape[1] else ws // 2
                x = SwinBlock(dim, heads, ws, shift, self.mlp_ratio,
                              float(dpr[cur + blk]), dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"stages_{stage}_blocks_{blk}")(x, deterministic)
            cur += depth
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{stage}", x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _swin(embed_dim, depths, heads, **kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks"):
        kw.pop(k, None)
    return SwinTransformer(embed_dim=embed_dim, depths=depths,
                           num_heads=heads, **kw)


@register_model
def swin_tiny_patch4_window7_224(**kw):
    return _swin(96, (2, 2, 6, 2), (3, 6, 12, 24), **kw)


@register_model
def swin_small_patch4_window7_224(**kw):
    return _swin(96, (2, 2, 18, 2), (3, 6, 12, 24), **kw)


@register_model
def swin_base_patch4_window7_224(**kw):
    return _swin(128, (2, 2, 18, 2), (4, 8, 16, 32), **kw)


@register_model
def swin_large_patch4_window7_224(**kw):
    return _swin(192, (2, 2, 18, 2), (6, 12, 24, 48), **kw)


def _swin_kw(_dim, _depths, _heads, **kw):
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depths", _depths)
    kw.setdefault("num_heads", _heads)
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks"):
        kw.pop(k, None)
    return SwinTransformer(**kw)


@register_model
def swin_base_patch4_window12_384(**kw):
    kw.setdefault("img_size", 384)
    kw.setdefault("window_size", 12)
    return _swin_kw(128, (2, 2, 18, 2), (4, 8, 16, 32), **kw)


@register_model
def swin_large_patch4_window12_384(**kw):
    kw.setdefault("img_size", 384)
    kw.setdefault("window_size", 12)
    return _swin_kw(192, (2, 2, 18, 2), (6, 12, 24, 48), **kw)


@register_model
def swin_s3_tiny_224(**kw):
    kw.setdefault("window_size", (7, 7, 14, 7))
    return _swin_kw(96, (2, 2, 6, 2), (3, 6, 12, 24), **kw)


@register_model
def swin_s3_small_224(**kw):
    kw.setdefault("window_size", (14, 14, 14, 7))
    return _swin_kw(96, (2, 2, 18, 2), (3, 6, 12, 24), **kw)


@register_model
def swin_s3_base_224(**kw):
    kw.setdefault("window_size", (7, 7, 14, 7))
    return _swin_kw(96, (2, 2, 30, 2), (3, 6, 12, 24), **kw)
