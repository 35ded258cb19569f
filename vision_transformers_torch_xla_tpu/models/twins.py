"""Twins (PCPVT + SVT) in Flax, NHWC.

Parity with the reference's dormant twins.py (581 LoC; SURVEY §2.2):

* twins_pcpvt_*: PVT-style pyramid with global sub-sampled attention
  (GSA — keys/values spatially reduced by a strided conv) and conditional
  position encoding (CPE, depthwise conv residual) after the first block
  of each stage instead of absolute pos embeds
* twins_svt_*: alternates locally-grouped self-attention (LSA — unshifted
  window attention) with GSA blocks
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
from vision_transformers_torch_xla_tpu.models.swin import (
    _window_merge,
    _window_partition,
)

__all__ = []


class TwinsAttention(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1  # GSA key/value reduction stride
    window_size: int = 0  # >0 -> LSA (local window attention)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = self.num_heads
        hd = c // h

        def mha(q_in, kv_in):
            nq, nk = q_in.shape[1], kv_in.shape[1]
            q = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=nn.with_logical_partitioning(
                             trunc_init, ("embed", "qkv_out")),
                         name="q")(q_in)
            kv = nn.Dense(2 * c, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          kernel_init=nn.with_logical_partitioning(
                              trunc_init, ("embed", "qkv_out")),
                          name="kv")(kv_in)
            q = q.reshape(-1, nq, h, hd).transpose(0, 2, 1, 3)
            kv = kv.reshape(-1, nk, 2, h, hd).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * (hd ** -0.5), axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(-1, nq, c)
            return nn.Dense(c, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            kernel_init=nn.with_logical_partitioning(
                                trunc_init, ("qkv_out", "embed")),
                            name="proj")(out.astype(x.dtype))

        if self.window_size:  # LSA
            ws = min(self.window_size, hh)
            t = _window_partition(x, ws)
            out = mha(t, t)
            return _window_merge(out, ws, hh, ww)
        # GSA: reduce k/v spatially
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                            strides=self.sr_ratio, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="sr_norm")(kv_in)
        kv_in = kv_in.reshape(b, -1, c)
        return mha(x.reshape(b, hh * ww, c), kv_in).reshape(b, hh, ww, c)


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int = 1
    window_size: int = 0
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        y = TwinsAttention(c, self.num_heads, self.sr_ratio,
                           self.window_size, dtype=self.dtype,
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


class Twins(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[float] = (8.0, 8.0, 4.0, 4.0)
    window_size: int = 0  # >0 -> SVT (alternate LSA/GSA)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for si, (dim, heads, depth) in enumerate(zip(self.embed_dims,
                                                     self.num_heads,
                                                     self.depths)):
            p = 4 if si == 0 else 2
            x = nn.Conv(dim, (p, p), strides=p, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"patch_embed_{si}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"patch_norm_{si}")(x)
            for blk in range(depth):
                ws = 0
                if self.window_size and blk % 2 == 0:
                    ws = self.window_size  # SVT alternation: LSA then GSA
                x = TwinsBlock(dim, heads, self.sr_ratios[si], ws,
                               self.mlp_ratios[si],
                               drop_path_rate=float(dpr[bi]),
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"stages_{si}_blocks_{blk}")(
                    x, deterministic)
                if blk == 0:
                    # conditional position encoding after block 0
                    c = x.shape[-1]
                    x = x + nn.Conv(c, (3, 3), feature_group_count=c,
                                    padding="SAME", dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"pos_block_{si}")(x)
                bi += 1
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _twins(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Twins(**merged)

    return build


_VARIANTS = {
    "twins_pcpvt_small": dict(embed_dims=(64, 128, 320, 512),
                              num_heads=(1, 2, 5, 8), depths=(3, 4, 6, 3)),
    "twins_pcpvt_base": dict(embed_dims=(64, 128, 320, 512),
                             num_heads=(1, 2, 5, 8), depths=(3, 4, 18, 3)),
    "twins_pcpvt_large": dict(embed_dims=(64, 128, 320, 512),
                              num_heads=(1, 2, 5, 8), depths=(3, 8, 27, 3)),
    "twins_svt_small": dict(embed_dims=(64, 128, 256, 512),
                            num_heads=(2, 4, 8, 16), depths=(2, 2, 10, 4),
                            mlp_ratios=(4.0, 4.0, 4.0, 4.0), window_size=7),
    "twins_svt_base": dict(embed_dims=(96, 192, 384, 768),
                           num_heads=(3, 6, 12, 24), depths=(2, 2, 18, 2),
                           mlp_ratios=(4.0, 4.0, 4.0, 4.0), window_size=7),
    "twins_svt_large": dict(embed_dims=(128, 256, 512, 1024),
                            num_heads=(4, 8, 16, 32), depths=(2, 2, 18, 2),
                            mlp_ratios=(4.0, 4.0, 4.0, 4.0), window_size=7),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _twins(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Twins variant {_name!r} (reference twins.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
