"""VOLO (Vision Outlooker) in Flax, NHWC.

Parity with the reference's dormant volo.py (1344 LoC; SURVEY §2.2):
a two-resolution trunk — outlook-attention blocks at stride 8, a conv
downsample to stride 16, then standard transformer blocks, a class token
appended for two final class-attention ("post") blocks, and a token +
cls fused head.

Outlook attention (reference volo.py OutlookAttention, stride 2): a
k^2 x k^2 attention matrix per pooled position re-weights the unfolded
k^2 value neighborhood, and overlapping windows fold back additively.
The torch F.fold scatter is expressed here as k^2 static strided adds
into a dilated canvas (q = p*stride - pad + offset), which XLA lowers to
interior-padded adds — no dynamic scatter on TPU.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Block,
    Mlp,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class OutlookAttention(nn.Module):
    """Reference volo.py:33-115: v-unfold, k^4 dynamic attention from the
    stride-pooled tokens, attn @ v, additive fold back to full resolution.
    """
    dim: int
    num_heads: int
    kernel: int = 3
    stride: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h, k, s = self.num_heads, self.kernel, self.stride
        pad = k // 2
        hd = c // h
        gh, gw = -(-hh // s), -(-ww // s)  # ceil
        v = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="v")(x)
        # strided unfold: (b, gh, gw, k*k, h, hd); patch channels are
        # ordered (c, kh, kw) by conv_general_dilated_patches
        patches = jax.lax.conv_general_dilated_patches(
            v.transpose(0, 3, 1, 2), (k, k), (s, s),
            padding=[(pad, pad + (gh * s - hh)), (pad, pad + (gw * s - ww))])
        patches = patches.reshape(b, c, k * k, gh, gw)
        patches = patches.transpose(0, 3, 4, 2, 1).reshape(
            b, gh, gw, k * k, h, hd)
        # attention from the stride-pooled map: (gh, gw, h, k^2(q), k^2(k))
        a_in = x
        if s > 1:
            ph, pw = gh * s - hh, gw * s - ww  # ceil-mode avg pool
            a_in = nn.avg_pool(x, (s, s), strides=(s, s),
                               padding=((0, ph), (0, pw)),
                               count_include_pad=False)
        attn = nn.Dense(h * k ** 4, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="attn")(a_in)
        attn = attn.reshape(b, gh, gw, h, k * k, k * k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        # (b, gh, gw, k*k(q), h, hd)
        out = jnp.einsum("bxyhqk,bxykhd->bxyqhd", attn.astype(patches.dtype),
                         patches, preferred_element_type=jnp.float32)
        out = out.reshape(b, gh, gw, k * k, c).astype(x.dtype)
        # fold: out[q] = sum over (p, offset) with q = p*s - pad + offset,
        # as k^2 static strided adds into a padded canvas
        canvas = jnp.zeros((b, s * (gh - 1) + k, s * (gw - 1) + k, c),
                           out.dtype)
        for ki in range(k):
            for kj in range(k):
                canvas = canvas.at[:, ki:ki + s * (gh - 1) + 1:s,
                                   kj:kj + s * (gw - 1) + 1:s, :].add(
                    out[:, :, :, ki * k + kj, :])
        out = canvas[:, pad:pad + hh, pad:pad + ww, :]
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(out)


class Outlooker(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        y = OutlookAttention(c, self.num_heads, dtype=self.dtype,
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


class Volo(nn.Module):
    embed_dims: Sequence[int] = (192, 384)
    depths: Sequence[int] = (4, 14)  # (outlooker, transformer)
    num_heads: Sequence[int] = (6, 12)
    post_blocks: int = 2  # class-attention blocks
    stem_hidden: int = 64  # 128 for d5 (reference volo.py:1312)
    mlp_ratio: float = 3.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        x = x.astype(self.dtype)
        # 3-conv stem to stride 2 + k4/s4 proj -> stride 8 (reference
        # volo.py PatchEmbed:474-519: hidden_dim convs 7/2, 3/1, 3/1,
        # each BN+ReLU, bias-free)
        c0 = self.embed_dims[0]
        hid = self.stem_hidden
        for i, (kk, ss) in enumerate(((7, 2), (3, 1), (3, 1))):
            x = nn.Conv(hid, (kk, kk), strides=ss, padding=kk // 2,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"stem_conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"stem_bn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.Conv(c0, (4, 4), strides=4, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="stem_proj")(x)

        d0, d1 = self.depths
        dpr = np.linspace(0, self.drop_path_rate, d0 + d1)
        for blk in range(d0):
            x = Outlooker(c0, self.num_heads[0], self.mlp_ratio,
                          float(dpr[blk]), dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"outlooker_{blk}")(x, deterministic)
        # downsample to stride 16, dim up
        c1 = self.embed_dims[1]
        x = nn.Conv(c1, (2, 2), strides=2, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="downsample")(x)
        hh, ww = x.shape[1], x.shape[2]
        t = x.reshape(b, hh * ww, c1)
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(
                             trunc_init, (None, None, "embed")),
                         (1, hh * ww, c1), self.param_dtype)
        t = t + pos.astype(t.dtype)
        for blk in range(d1):
            t = Block(self.num_heads[1], self.mlp_ratio,
                      drop_path_rate=float(dpr[d0 + blk]), dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name=f"blocks_{blk}")(t, deterministic)
        # class attention: cls token attends over tokens (reference
        # volo.py ClassBlock; same design as CaiT's class attention)
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(
                             trunc_init, (None, None, "embed")),
                         (1, 1, c1), self.param_dtype)
        t = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(t.dtype), (b, 1, c1)), t], axis=1)
        for blk in range(self.post_blocks):
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"post_{blk}_norm1")(t)
            h = self.num_heads[1]
            hd = c1 // h
            q = nn.Dense(c1, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"post_{blk}_q")(y[:, :1])
            kv = nn.Dense(2 * c1, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"post_{blk}_kv")(y)
            q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
            kv = kv.reshape(b, -1, 2, h, hd).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            attn = jax.nn.softmax(jnp.einsum(
                "bhqd,bhkd->bhqk", q, k,
                preferred_element_type=jnp.float32) * hd ** -0.5, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            o = o.transpose(0, 2, 1, 3).reshape(b, 1, c1).astype(t.dtype)
            o = nn.Dense(c1, dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"post_{blk}_proj")(o)
            cls_t = t[:, :1] + o
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"post_{blk}_norm2")(cls_t)
            y = Mlp(int(c1 * self.mlp_ratio), c1, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"post_{blk}_mlp")(y, deterministic)
            t = jnp.concatenate([cls_t + y, t[:, 1:]], axis=1)
        t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(t)
        # fused head: cls logits + max-pooled token logits (reference
        # volo.py forward: x[:,0] + 0.5 * aux.max(1))
        if self.num_classes == 0:
            return t[:, 0]
        head = nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(t[:, 0])
        aux = nn.Dense(self.num_classes, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       name="aux_head")(t[:, 1:])
        return (head + 0.5 * aux.max(axis=1)).astype(jnp.float32)


def _volo(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Volo(**merged)

    return build


# (embed_dims, depths, heads) per model scale; img variants share them
_D1 = dict(embed_dims=(192, 384), depths=(4, 14), num_heads=(6, 12))
_D2 = dict(embed_dims=(256, 512), depths=(6, 18), num_heads=(8, 16))
_D3 = dict(embed_dims=(256, 512), depths=(8, 28), num_heads=(8, 16))
_D4 = dict(embed_dims=(384, 768), depths=(8, 28), num_heads=(12, 16))
_D5 = dict(embed_dims=(384, 768), depths=(12, 36), num_heads=(12, 16),
           mlp_ratio=4.0, stem_hidden=128)

_VARIANTS = {
    "volo_d1_224": dict(_D1, img_size=224),
    "volo_d1_384": dict(_D1, img_size=384),
    "volo_d2_224": dict(_D2, img_size=224),
    "volo_d2_384": dict(_D2, img_size=384),
    "volo_d3_224": dict(_D3, img_size=224),
    "volo_d3_448": dict(_D3, img_size=448),
    "volo_d4_224": dict(_D4, img_size=224),
    "volo_d4_448": dict(_D4, img_size=448),
    "volo_d5_224": dict(_D5, img_size=224),
    "volo_d5_448": dict(_D5, img_size=448),
    "volo_d5_512": dict(_D5, img_size=512),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _volo(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"VOLO variant {_name!r} (reference volo.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
