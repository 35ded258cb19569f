"""TNT (Transformer-in-Transformer) in Flax.

Parity with the reference's dormant tnt.py (~570 LoC; SURVEY §2.2):
each 16x16 patch is embedded as a 4x4 grid of pixel tokens (conv k7 s4
applied per patch) processed by an inner transformer; after the inner
block, the flattened pixel tokens are projected and added to the patch
token, which an outer transformer processes with a cls token (reference
tnt.py:133-151). Legacy variant differs only in the projection order of
the pixel->patch fusion.

TPU notes: the unfold is a reshape/transpose (free); inner attention runs
as one batched (B·N, 16, inner_dim) attention — large leading batch keeps
the MXU busy despite tiny sequences.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _Attn(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        hd = self.dim // h
        # reference tnt.py:28-59: qk fused at dim, v at dim
        qk = nn.Dense(2 * self.dim, use_bias=self.qkv_bias,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="qk")(x)
        qk = qk.reshape(b, n, 2, h, hd).transpose(2, 0, 3, 1, 4)
        q, k = qk[0], qk[1]
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="v")(x)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * hd ** -0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(o)


class TNT(nn.Module):
    """Reference tnt.py:218-420 (TNT)."""

    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    inner_dim: int = 24
    depth: int = 12
    num_heads_inner: int = 4
    num_heads_outer: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    first_stride: int = 4
    legacy: bool = False
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        b, hh, ww, c = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        n = gh * gw
        ps = -(-p // self.first_stride)              # pixels per side (4)
        npix = ps * ps

        # unfold to per-patch images, conv k7 s4 -> pixel tokens
        t = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        t = t.reshape(b * n, p, p, c).astype(self.dtype)
        t = nn.Conv(self.inner_dim, (7, 7),
                    strides=(self.first_stride, self.first_stride),
                    padding=((3, 3), (3, 3)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pixel_proj")(t)
        pixel_pos = self.param("pixel_pos", trunc_init,
                               (1, ps, ps, self.inner_dim), self.param_dtype)
        t = t + pixel_pos.astype(t.dtype)
        pixel = t.reshape(b * n, npix, self.inner_dim)

        # outer patch embedding from flattened pixels (reference :270-274)
        flat = pixel.reshape(b, n, npix * self.inner_dim)
        flat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="norm1_proj")(flat)
        patch = nn.Dense(self.embed_dim, use_bias=self.legacy,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="proj")(flat)
        if not self.legacy:
            patch = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="norm2_proj")(patch)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim), self.param_dtype)
        cls = jnp.broadcast_to(cls.astype(patch.dtype),
                               (b, 1, self.embed_dim))
        patch = jnp.concatenate([cls, patch], axis=1)
        patch_pos = self.param("patch_pos", trunc_init,
                               (1, n + 1, self.embed_dim), self.param_dtype)
        patch = patch + patch_pos.astype(patch.dtype)

        ln = dict(epsilon=1e-5, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            rng = lambda: (None if deterministic or dpr == 0  # noqa: E731
                           else self.make_rng("droppath"))
            # inner transformer on pixel tokens (reference :133-136)
            y = _Attn(self.inner_dim, self.num_heads_inner, self.qkv_bias,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"blocks_{i}_attn_in")(
                nn.LayerNorm(**ln, name=f"blocks_{i}_norm_in")(pixel))
            pixel = pixel + drop_path(y, dpr, deterministic, rng())
            y = Mlp(hidden_dim=int(self.inner_dim * 4),
                    out_dim=self.inner_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{i}_mlp_in")(
                nn.LayerNorm(**ln, name=f"blocks_{i}_norm_mlp_in")(pixel),
                deterministic)
            pixel = pixel + drop_path(y, dpr, deterministic, rng())

            # pixel -> patch fusion (reference :138-148)
            flat = pixel.reshape(b, n, npix * self.inner_dim)
            if self.legacy:
                fused = nn.Dense(self.embed_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"blocks_{i}_proj")(
                    nn.LayerNorm(**ln, name=f"blocks_{i}_norm1_proj")(flat))
            else:
                fused = nn.LayerNorm(**ln, name=f"blocks_{i}_norm2_proj")(
                    nn.Dense(self.embed_dim, use_bias=False,
                             dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"blocks_{i}_proj")(
                        nn.LayerNorm(**ln,
                                     name=f"blocks_{i}_norm1_proj")(flat)))
            patch = jnp.concatenate(
                [patch[:, 0:1], patch[:, 1:] + fused], axis=1)

            # outer transformer on patch tokens (reference :149-150)
            y = _Attn(self.embed_dim, self.num_heads_outer, self.qkv_bias,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"blocks_{i}_attn_out")(
                nn.LayerNorm(**ln, name=f"blocks_{i}_norm_out")(patch))
            patch = patch + drop_path(y, dpr, deterministic, rng())
            y = Mlp(hidden_dim=int(self.embed_dim * self.mlp_ratio),
                    out_dim=self.embed_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{i}_mlp")(
                nn.LayerNorm(**ln, name=f"blocks_{i}_norm_mlp")(patch),
                deterministic)
            patch = patch + drop_path(y, dpr, deterministic, rng())

        patch = nn.LayerNorm(**ln, name="norm")(patch)
        out = patch[:, 0]
        if self.num_classes == 0:
            return out
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(out).astype(jnp.float32)


def _tnt(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return TNT(**merged)

    return build


_VARIANTS = {
    "tnt_s_legacy_patch16_224": dict(embed_dim=384, inner_dim=24, depth=12,
                                     num_heads_outer=6, legacy=True),
    "tnt_s_patch16_224": dict(embed_dim=384, inner_dim=24, depth=12,
                              num_heads_outer=6),
    "tnt_b_patch16_224": dict(embed_dim=640, inner_dim=40, depth=12,
                              num_heads_outer=10),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _tnt(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"TNT variant {_name!r} (reference tnt.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
