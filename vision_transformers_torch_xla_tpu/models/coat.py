"""CoaT (Co-scale Conv-Attentional Transformers) in Flax, NHWC.

Parity with the reference's dormant coat.py (802 LoC; SURVEY §2.2):

* factorized conv-attention: ``q @ (softmax(k)^T v)`` linear attention
  plus a convolutional relative position term (depthwise conv on v,
  gated by q)
* convolutional position encoding (depthwise conv residual) per block
* `coat_lite_*`: serial pyramid only; `coat_tiny/mini/small`: adds
  parallel co-scale blocks over the last three scales with bilinear
  cross-scale fusion after each parallel step
"""
from __future__ import annotations

from typing import Sequence

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


class FactorAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = self.num_heads
        hd = c // h
        n = hh * ww
        qkv = nn.Dense(3 * c, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x.reshape(b, n, c))
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        # factorized attention: O(N d^2)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=2).astype(v.dtype)
        ctx = jnp.einsum("bhkd,bhke->bhde", k, v,
                         preferred_element_type=jnp.float32)
        fat = jnp.einsum("bhqd,bhde->bhqe", q, ctx.astype(q.dtype),
                         preferred_element_type=jnp.float32) * (hd ** -0.5)
        # convolutional relative position: q * dwconv(v)
        vg = v.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        crpe = nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                       use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="crpe")(vg)
        crpe = crpe.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        out = fat.astype(x.dtype) + q * crpe
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("qkv_out", "embed")),
                       name="proj")(out)
        return out.reshape(b, hh, ww, c)


class CoatBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        # convolutional position encoding
        x = x + nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="cpe")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        y = FactorAttention(c, self.num_heads, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="attn")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class CoaT(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 256, 320)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: int = 8
    mlp_ratios: Sequence[float] = (8.0, 8.0, 4.0, 4.0)
    parallel_depth: int = 0  # co-scale parallel blocks (non-lite variants)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        feats = []
        for si, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            p = 4 if si == 0 else 2
            x = nn.Conv(dim, (p, p), strides=p, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"patch_embed_{si}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"patch_norm_{si}")(x)
            for blk in range(depth):
                x = CoatBlock(dim, self.num_heads, self.mlp_ratios[si],
                              dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"serial_{si}_blocks_{blk}")(
                    x, deterministic)
            feats.append(x)

        if self.parallel_depth:
            # co-scale: parallel blocks on scales 2-4 + cross-scale fusion
            scales = feats[1:]
            for pi in range(self.parallel_depth):
                scales = [
                    CoatBlock(s.shape[-1], self.num_heads,
                              self.mlp_ratios[-1], dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"parallel_{pi}_scale_{sj}")(
                        s, deterministic)
                    for sj, s in enumerate(scales)]
                fused = []
                for sj, s in enumerate(scales):
                    agg = s
                    for sk, o in enumerate(scales):
                        if sk == sj:
                            continue
                        agg = agg + jax.image.resize(
                            nn.Dense(s.shape[-1], dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"fuse_{pi}_{sj}_{sk}")(o),
                            s.shape, method="bilinear")
                    fused.append(agg)
                scales = fused
            x = scales[-1]
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _coat(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return CoaT(**merged)

    return build


_VARIANTS = {
    "coat_tiny": dict(embed_dims=(152, 152, 152, 152), depths=(2, 2, 2, 2),
                      mlp_ratios=(4.0, 4.0, 4.0, 4.0), parallel_depth=6),
    "coat_mini": dict(embed_dims=(152, 216, 216, 216), depths=(2, 2, 2, 2),
                      mlp_ratios=(4.0, 4.0, 4.0, 4.0), parallel_depth=6),
    "coat_small": dict(embed_dims=(152, 320, 320, 320), depths=(2, 2, 2, 2),
                       mlp_ratios=(4.0, 4.0, 4.0, 4.0), parallel_depth=6),
    "coat_lite_tiny": dict(embed_dims=(64, 128, 256, 320),
                           depths=(2, 2, 2, 2)),
    "coat_lite_mini": dict(embed_dims=(64, 128, 320, 512),
                           depths=(2, 2, 2, 2)),
    "coat_lite_small": dict(embed_dims=(64, 128, 320, 512),
                            depths=(3, 4, 6, 3)),
    "coat_lite_medium": dict(embed_dims=(128, 256, 320, 512),
                             depths=(3, 6, 10, 8),
                             mlp_ratios=(4.0, 4.0, 4.0, 4.0)),
    "coat_lite_medium_384": dict(embed_dims=(128, 256, 320, 512),
                                 depths=(3, 6, 10, 8),
                                 mlp_ratios=(4.0, 4.0, 4.0, 4.0),
                                 img_size=384),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _coat(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"CoaT variant {_name!r} (reference coat.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
