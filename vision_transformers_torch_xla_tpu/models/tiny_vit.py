"""TinyViT in Flax, NHWC.

Parity with the reference's dormant tiny_vit.py (775 LoC; SURVEY §2.2):
a 4-stage hybrid — MBConv stage 1, then window-attention transformer
stages with learned per-offset attention biases (no softmax-scale tricks),
conv downsampling between stages, and a 3x3 depthwise "local conv" inside
each transformer block.
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
    drop_path,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.swin import (
    _window_merge,
    _window_partition,
)

__all__ = []


def _rel_index(ws: int) -> np.ndarray:
    ky, kx = np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    pts = np.stack([ky.reshape(-1), kx.reshape(-1)], 1)
    d = np.abs(pts[:, None] - pts[None, :])
    return d[..., 0] * ws + d[..., 1]


class _MBConv(nn.Module):
    out_ch: int
    expand: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        mid = int(self.out_ch * self.expand)
        y = nn.gelu(bn(name="bn1")(conv(mid, (1, 1), name="conv1")(x)))
        y = conv(mid, (3, 3), feature_group_count=mid, name="conv2")(y)
        y = nn.gelu(bn(name="bn2")(y))
        y = bn(name="bn3")(conv(self.out_ch, (1, 1), name="conv3")(y))
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return nn.gelu(x + drop_path(y, self.drop_path_rate, deterministic,
                                     rng))


class TinyVitBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        ws = min(self.window_size, hh)
        h = self.num_heads
        hd = c // h
        shortcut = x

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        y = _window_partition(y, ws)
        bnw, n, _ = y.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="qkv")(y)
        qkv = qkv.reshape(bnw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        table = self.param("attention_biases", nn.initializers.zeros,
                           (h, ws * ws), self.param_dtype)
        idx = _rel_index(ws)
        attn = attn + table[:, idx.reshape(-1)].reshape(
            h, n, n)[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        y = y.transpose(0, 2, 1, 3).reshape(bnw, n, c).astype(x.dtype)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj")(y)
        y = _window_merge(y, ws, hh, ww)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(y, self.drop_path_rate, deterministic, rng)

        # 3x3 depthwise local conv between attention and MLP
        y = nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="local_conv")(x)
        x = x + nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="local_bn")(y)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class TinyVit(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        c0 = self.embed_dims[0]
        x = nn.gelu(bn(name="stem_bn1")(conv(c0 // 2, (3, 3), strides=2,
                                             name="stem_conv1")(x)))
        x = bn(name="stem_bn2")(conv(c0, (3, 3), strides=2,
                                     name="stem_conv2")(x))

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for si, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            if si > 0:
                # conv downsample (merge): 1x1 -> dw 3x3 s2 -> 1x1
                x = nn.gelu(conv(dim, (1, 1),
                                 name=f"merge_{si}_conv1")(x))
                x = nn.gelu(conv(dim, (3, 3), strides=2,
                                 feature_group_count=dim,
                                 name=f"merge_{si}_conv2")(x))
                x = conv(dim, (1, 1), name=f"merge_{si}_conv3")(x)
            for blk in range(depth):
                name = f"stages_{si}_blocks_{blk}"
                if si == 0:
                    x = _MBConv(dim, drop_path_rate=float(dpr[bi]),
                                dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=name)(x, deterministic)
                else:
                    x = TinyVitBlock(dim, self.num_heads[si],
                                     self.window_sizes[si],
                                     drop_path_rate=float(dpr[bi]),
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=name)(x, deterministic)
                bi += 1
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _tiny_vit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return TinyVit(**merged)

    return build


_VARIANTS = {
    "tiny_vit_5m_224": dict(embed_dims=(64, 128, 160, 320),
                            depths=(2, 2, 6, 2), num_heads=(2, 4, 5, 10),
                            window_sizes=(7, 7, 14, 7)),
    "tiny_vit_11m_224": dict(embed_dims=(64, 128, 256, 448),
                             depths=(2, 2, 6, 2), num_heads=(2, 4, 8, 14),
                             window_sizes=(7, 7, 14, 7)),
    "tiny_vit_21m_224": dict(embed_dims=(96, 192, 384, 576),
                             depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 18),
                             window_sizes=(7, 7, 14, 7)),
    "tiny_vit_21m_384": dict(embed_dims=(96, 192, 384, 576),
                             depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 18),
                             window_sizes=(12, 12, 24, 12), img_size=384),
    "tiny_vit_21m_512": dict(embed_dims=(96, 192, 384, 576),
                             depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 18),
                             window_sizes=(16, 16, 32, 16), img_size=512),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _tiny_vit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"TinyViT variant {_name!r} (reference tiny_vit.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
