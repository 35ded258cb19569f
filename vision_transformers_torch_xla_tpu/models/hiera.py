"""Hiera in Flax, NHWC.

Parity with the reference's dormant hiera.py (998 LoC; SURVEY §2.2):
a hierarchical ViT with no convs beyond the patch stem —

* 7x7/4 conv patch embed with learned absolute pos embed
* mask-unit (local-window) attention in the first two stages, global
  attention afterwards
* q-pooling at stage transitions: queries max-pooled 2x2 inside the
  attention, keys/values at full resolution; channel dim doubles
* standard MLP; stage-dependent head count doubling
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


class HieraAttention(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int = 1  # 2 at stage transitions (max-pool the queries)
    window: int = 0  # 0 -> global attention, else local window side
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = self.num_heads
        do = self.dim_out
        hd = do // h
        qkv = nn.Dense(3 * do, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        oh, ow = hh, ww
        if self.q_stride > 1:
            q = nn.max_pool(q, (self.q_stride, self.q_stride),
                            strides=(self.q_stride, self.q_stride))
            oh, ow = q.shape[1], q.shape[2]

        if self.window:
            wq = self.window // self.q_stride  # query-side window
            wk = self.window

            def part(t, w):
                tb, th, tw, tc = t.shape
                t = t.reshape(tb, th // w, w, tw // w, w, tc)
                return t.transpose(0, 1, 3, 2, 4, 5).reshape(
                    tb * (th // w) * (tw // w), w * w, tc)

            q, k, v = part(q, wq), part(k, wk), part(v, wk)
        else:
            q = q.reshape(b, oh * ow, do)
            k = k.reshape(b, hh * ww, do)
            v = v.reshape(b, hh * ww, do)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd).transpose(
                0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).astype(x.dtype)
        out = out.reshape(out.shape[0], out.shape[1], do)
        if self.window:
            wq = self.window // self.q_stride
            nwh = oh // wq
            out = out.reshape(b, nwh, ow // wq, wq, wq, do)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, oh, ow, do)
        else:
            out = out.reshape(b, oh, ow, do)
        return nn.Dense(do, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(out)


class HieraBlock(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: int = 1
    window: int = 0
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
            shortcut = nn.max_pool(shortcut,
                                   (self.q_stride, self.q_stride),
                                   strides=(self.q_stride, self.q_stride))
        y = HieraAttention(self.dim_out, self.num_heads, self.q_stride,
                           self.window, dtype=self.dtype,
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


class Hiera(nn.Module):
    embed_dim: int = 96
    num_heads: int = 1
    depths: Sequence[int] = (2, 3, 16, 3)
    mask_unit: int = 8  # local-window side (tokens) for stages 1-2
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (7, 7), strides=4, padding=3,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        hh, ww = x.shape[1], x.shape[2]
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(
                             trunc_init, (None, None, "embed")),
                         (1, hh * ww, self.embed_dim), self.param_dtype)
        x = x + pos.reshape(1, hh, ww, self.embed_dim).astype(self.dtype)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        dim, heads = self.embed_dim, self.num_heads
        for si, depth in enumerate(self.depths):
            for blk in range(depth):
                first = blk == 0 and si > 0
                if first:
                    dim, heads = dim * 2, heads * 2
                window = 0
                if si < 2:  # mask-unit attention in early stages
                    window = min(self.mask_unit // (2 ** si), x.shape[1])
                    if first:
                        window = max(window, 2)
                x = HieraBlock(dim, heads, q_stride=2 if first else 1,
                               window=window, drop_path_rate=float(dpr[bi]),
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


def _hiera(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Hiera(**merged)

    return build


_VARIANTS = {
    "hiera_tiny_224": dict(embed_dim=96, num_heads=1, depths=(1, 2, 7, 2)),
    "hiera_small_224": dict(embed_dim=96, num_heads=1, depths=(1, 2, 11, 2)),
    "hiera_base_224": dict(embed_dim=96, num_heads=1, depths=(2, 3, 16, 3)),
    "hiera_base_plus_224": dict(embed_dim=112, num_heads=2,
                                depths=(2, 3, 16, 3)),
    "hiera_large_224": dict(embed_dim=144, num_heads=2,
                            depths=(2, 6, 36, 4)),
    "hiera_huge_224": dict(embed_dim=256, num_heads=4, depths=(2, 6, 36, 4)),
    "hiera_small_abswin_256": dict(embed_dim=96, num_heads=1,
                                   depths=(1, 2, 11, 2), img_size=256),
    "hiera_base_abswin_256": dict(embed_dim=96, num_heads=1,
                                  depths=(2, 3, 16, 3), img_size=256),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _hiera(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Hiera variant {_name!r} (reference hiera.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
