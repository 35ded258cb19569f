"""ViT with relative-position-bias attention in Flax.

Parity with the reference's dormant vision_transformer_relpos.py
(705 LoC; SURVEY §2.2): no absolute position embedding — each attention
layer adds a per-head bias produced by a 2-layer MLP over log-spaced
relative grid coordinates (SwinV2-style continuous bias, reference
RelPosMlp via vision_transformer_relpos.py:34-107); srelpos variants
share one bias across all blocks; rpn variants use residual-post-norm
blocks. No class token (GAP + fc-norm head) except the _cls variants.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    PatchEmbed,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _rel_index(g: int):
    """(N, N) index into the (2g-1)^2 relative-offset table, plus the
    normalized log-spaced coordinate table."""
    coords = np.stack(np.meshgrid(np.arange(g), np.arange(g),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]         # (2, N, N)
    idx = (rel[0] + g - 1) * (2 * g - 1) + (rel[1] + g - 1)
    t = np.stack(np.meshgrid(np.arange(-(g - 1), g),
                             np.arange(-(g - 1), g),
                             indexing="ij"), axis=-1).astype(np.float32)
    table = np.sign(t) * np.log2(1.0 + np.abs(t)) / np.log2(8.0)
    return idx.astype(np.int32), table.reshape(-1, 2)


class _RelPosMlp(nn.Module):
    """Per-head bias from a 2-layer MLP on log relative coords."""

    num_heads: int
    grid: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        idx, table = _rel_index(self.grid)
        t = jnp.asarray(table, jnp.float32)
        h = nn.relu(nn.Dense(512, dtype=jnp.float32,
                             param_dtype=self.param_dtype,
                             name="fc1")(t))
        b = nn.Dense(self.num_heads, use_bias=False, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="fc2")(h)
        bias = b[idx]                                   # (N, N, H)
        return bias.transpose(2, 0, 1)                  # (H, N, N)


class _RelPosBlock(nn.Module):
    dim: int
    num_heads: int
    grid: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    res_post_norm: bool = False
    shared_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shared_bias=None, deterministic: bool = True):
        c = self.dim
        h = self.num_heads
        hd = c // h
        ln = dict(epsilon=1e-6, dtype=self.dtype,
                  param_dtype=self.param_dtype)

        y = x if self.res_post_norm else nn.LayerNorm(**ln,
                                                      name="norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(y)
        b, n, _ = y.shape
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        if self.shared_bias:
            bias = shared_bias
        else:
            bias = _RelPosMlp(h, self.grid, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="rel_pos")()
        npatch = self.grid * self.grid
        if n == npatch:
            s = s + bias[None]
        else:
            # cls token rows/cols get zero bias (reference pads)
            extra = n - npatch
            pad = jnp.zeros((bias.shape[0], extra, n), jnp.float32)
            biasp = jnp.concatenate(
                [jnp.zeros((bias.shape[0], npatch, extra), jnp.float32),
                 bias], axis=-1)
            s = s + jnp.concatenate([pad, biasp], axis=1)[None]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        o = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("qkv_out", "embed")),
                     name="proj")(o)
        if self.res_post_norm:
            o = nn.LayerNorm(**ln, name="norm1")(o)
        x = x + o

        y = x if self.res_post_norm else nn.LayerNorm(**ln,
                                                      name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(y,
                                                          deterministic)
        if self.res_post_norm:
            y = nn.LayerNorm(**ln, name="norm2")(y)
        return x + y


class VisionTransformerRelPos(nn.Module):
    """Reference vision_transformer_relpos.py:150-400."""

    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    fc_norm: bool = True
    class_token: bool = False
    res_post_norm: bool = False
    shared_rel_pos: bool = False
    global_pool: str = "avg"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = self.embed_dim
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=dim,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="patch_embed")(x)
        grid = self.img_size // self.patch_size
        if self.class_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, dim), self.param_dtype)
            cls = jnp.broadcast_to(cls.astype(x.dtype),
                                   (x.shape[0], 1, dim))
            x = jnp.concatenate([cls, x], axis=1)
        shared = None
        if self.shared_rel_pos:
            shared = _RelPosMlp(self.num_heads, grid, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="shared_rel_pos")()
        for i in range(self.depth):
            x = _RelPosBlock(dim, self.num_heads, grid, self.mlp_ratio,
                             self.qkv_bias, self.res_post_norm,
                             self.shared_rel_pos, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"blocks_{i}")(x, shared, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.global_pool == "token" and self.class_token:
            x = x[:, 0]
        else:
            x = jnp.mean(x[:, 1:] if self.class_token else x, axis=1)
        if self.fc_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="fc_norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _vit_relpos(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return VisionTransformerRelPos(**merged)

    return build


_VARIANTS = {
    "vit_relpos_base_patch32_plus_rpn_256": dict(
        img_size=256, patch_size=32, embed_dim=896, depth=12,
        num_heads=14, res_post_norm=True, fc_norm=False),
    "vit_relpos_base_patch16_plus_240": dict(
        img_size=240, patch_size=16, embed_dim=896, depth=12,
        num_heads=14, fc_norm=False),
    "vit_relpos_small_patch16_224": dict(embed_dim=384, depth=12,
                                         num_heads=6),
    "vit_relpos_medium_patch16_224": dict(embed_dim=512, depth=12,
                                          num_heads=8),
    "vit_relpos_base_patch16_224": dict(embed_dim=768, depth=12,
                                        num_heads=12),
    "vit_srelpos_small_patch16_224": dict(embed_dim=384, depth=12,
                                          num_heads=6, fc_norm=False,
                                          shared_rel_pos=True),
    "vit_srelpos_medium_patch16_224": dict(embed_dim=512, depth=12,
                                           num_heads=8, fc_norm=False,
                                           shared_rel_pos=True),
    "vit_relpos_medium_patch16_cls_224": dict(
        embed_dim=512, depth=12, num_heads=8, class_token=True,
        global_pool="token", fc_norm=False),
    "vit_relpos_base_patch16_cls_224": dict(
        embed_dim=768, depth=12, num_heads=12, class_token=True,
        global_pool="token", fc_norm=False),
    "vit_relpos_base_patch16_clsgap_224": dict(
        embed_dim=768, depth=12, num_heads=12, class_token=True),
    "vit_relpos_small_patch16_rpn_224": dict(
        embed_dim=384, depth=12, num_heads=6, res_post_norm=True,
        fc_norm=False),
    "vit_relpos_medium_patch16_rpn_224": dict(
        embed_dim=512, depth=12, num_heads=8, res_post_norm=True,
        fc_norm=False),
    "vit_relpos_base_patch16_rpn_224": dict(
        embed_dim=768, depth=12, num_heads=12, res_post_norm=True,
        fc_norm=False),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _vit_relpos(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"ViT-RelPos variant {_name!r} (reference "
                   f"vision_transformer_relpos.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
