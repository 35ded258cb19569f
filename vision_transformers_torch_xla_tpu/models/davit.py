"""DaViT (Dual Attention ViT) in Flax, NHWC.

Parity with the reference's dormant davit.py (887 LoC; SURVEY §2.2):
each stage alternates two complementary blocks —

* spatial block: unshifted window attention over patches
* channel block: attention transposed onto the channel axis (per-head
  channel groups attend over the full spatial extent)

with a depthwise-conv positional encoding (CPE) before each block and
conv patch merging between stages.
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


class DavitBlock(nn.Module):
    dim: int
    num_heads: int
    channel_attn: bool  # False -> spatial window attention
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        h = self.num_heads
        # conv positional encoding (depthwise 3x3 residual)
        x = x + nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="cpe")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        qkv_layer = nn.Dense(3 * c, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             kernel_init=nn.with_logical_partitioning(
                                 trunc_init, ("embed", "qkv_out")),
                             name="qkv")
        proj = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")
        if self.channel_attn:
            t = y.reshape(b, hh * ww, c)
            qkv = qkv_layer(t).reshape(b, hh * ww, 3, h, c // h)
            qkv = qkv.transpose(2, 0, 3, 4, 1)  # (3, b, h, cg, N)
            q, k, v = qkv[0], qkv[1], qkv[2]
            # attention over channel groups; scale on N like the reference
            attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * (q.shape[-1] ** -0.5), axis=-1)
            out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 3, 1, 2).reshape(b, hh * ww, c)
            y = proj(out.astype(x.dtype)).reshape(b, hh, ww, c)
        else:
            ws = min(self.window_size, hh, ww)
            # pad to a window multiple (reference davit.py pads without
            # masking; zero tokens only dilute softmax mass at edges)
            ph = (-hh) % ws
            pw = (-ww) % ws
            if ph or pw:
                y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = hh + ph, ww + pw
            t = _window_partition(y, ws)
            bnw, n, _ = t.shape
            qkv = qkv_layer(t).reshape(bnw, n, 3, h, c // h)
            qkv = qkv.transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * ((c // h) ** -0.5), axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
            y = _window_merge(proj(out.astype(x.dtype)), ws, hp, wp)
            if ph or pw:
                y = y[:, :hh, :ww]
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


class DaViT(nn.Module):
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    depths: Sequence[int] = (1, 1, 3, 1)  # dual blocks per stage
    window_size: int = 7
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dims[0], (7, 7), strides=4, padding=3,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="patch_norm")(x)
        total = 2 * sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for si, (dim, heads, depth) in enumerate(zip(self.embed_dims,
                                                     self.num_heads,
                                                     self.depths)):
            if si > 0:
                x = nn.Conv(dim, (2, 2), strides=2, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"downsample_{si}")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm_{si}")(x)
            for blk in range(depth):
                # dual block = spatial window attn + channel group attn
                x = DavitBlock(dim, heads, False, self.window_size,
                               drop_path_rate=float(dpr[bi]),
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"stages_{si}_blocks_{blk}_spatial")(
                    x, deterministic)
                x = DavitBlock(dim, heads, True, self.window_size,
                               drop_path_rate=float(dpr[bi + 1]),
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"stages_{si}_blocks_{blk}_channel")(
                    x, deterministic)
                bi += 2
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _davit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return DaViT(**merged)

    return build


_VARIANTS = {
    "davit_tiny": dict(embed_dims=(96, 192, 384, 768),
                       num_heads=(3, 6, 12, 24), depths=(1, 1, 3, 1)),
    "davit_small": dict(embed_dims=(96, 192, 384, 768),
                        num_heads=(3, 6, 12, 24), depths=(1, 1, 9, 1)),
    "davit_base": dict(embed_dims=(128, 256, 512, 1024),
                       num_heads=(4, 8, 16, 32), depths=(1, 1, 9, 1)),
    "davit_large": dict(embed_dims=(192, 384, 768, 1536),
                        num_heads=(6, 12, 24, 48), depths=(1, 1, 9, 1)),
    "davit_huge": dict(embed_dims=(256, 512, 1024, 2048),
                       num_heads=(8, 16, 32, 64), depths=(1, 1, 9, 1)),
    "davit_giant": dict(embed_dims=(384, 768, 1536, 3072),
                        num_heads=(12, 24, 48, 96), depths=(1, 1, 12, 3)),
    "davit_base_fl": dict(embed_dims=(128, 256, 512, 1024),
                          num_heads=(4, 8, 16, 32), depths=(1, 1, 9, 1)),
    "davit_huge_fl": dict(embed_dims=(256, 512, 1024, 2048),
                          num_heads=(8, 16, 32, 64), depths=(1, 1, 9, 1)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _davit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"DaViT variant {_name!r} (reference davit.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
