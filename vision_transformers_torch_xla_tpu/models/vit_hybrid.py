"""Hybrid ViT: convolutional stem + transformer trunk.

Parity with the reference's dormant vision_transformer_hybrid.py (408 LoC):
a small conv feature extractor replaces the linear patch embed, feeding the
standard ViT blocks. The stem here is 3x (conv-BN-ReLU stride 2) + 1x1 proj —
the 'R+ViT' recipe at 1/16 resolution.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import Block, _layer_norm, trunc_init
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer

__all__ = []


class ConvStem(nn.Module):
    """4-stage conv stem: stride 16 total, BN+ReLU between convs."""

    embed_dim: int = 768
    widths: tuple = (64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        for i, w in enumerate(self.widths):
            x = conv(w, (3, 3), strides=2, padding="SAME", name=f"conv{i}")(x)
            x = nn.relu(bn(name=f"bn{i}")(x))
        x = conv(self.embed_dim, (2, 2), strides=2, padding="VALID",
                 name="proj")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class VisionTransformerHybrid(VisionTransformer):
    """ViT trunk on a conv stem (BatchNorm stats -> model_state)."""

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b = x.shape[0]
        x = ConvStem(self.embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="patch_embed_backbone")(x, deterministic)
        n = x.shape[1]
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim)), x],
            axis=1)
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
                         (1, n + 1, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.pos_drop_rate)(x, deterministic=deterministic)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, init_values=self.init_values,
                      drop_path_rate=dpr, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name=f"blocks_{i}")(x, deterministic)
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        pooled = jnp.mean(x[:, 1:], axis=1) if self.global_pool == "avg" else x[:, 0]
        pooled = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="fc_norm")(pooled)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(pooled).astype(jnp.float32)


def _hybrid(dim, depth, heads, **kw):
    for k in ("pretrained_tag", "scan_blocks", "remat"):
        kw.pop(k, None)
    kw.pop("patch_size", None)
    return VisionTransformerHybrid(embed_dim=dim, depth=depth, num_heads=heads,
                                   **kw)


@register_model
def vit_small_r26_s32_224(**kw):
    return _hybrid(384, 12, 6, **kw)


@register_model
def vit_base_r50_s16_224(**kw):
    return _hybrid(768, 12, 12, **kw)
