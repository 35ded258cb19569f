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


class _StdConvGN(nn.Module):
    """StdConv (weight-standardized) + GroupNorm32 + optional ReLU —
    the non-preact ResNetV2 backbone unit of the reference hybrids
    (vision_transformer_hybrid.py:72-84)."""
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    bn: bool = False   # resnet26d/50d backbones use BatchNorm instead
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        if self.bn:
            x = nn.Conv(self.features, (k, k), strides=self.stride,
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(x)
        else:
            w = self.param("kernel", nn.initializers.he_normal(),
                           (k, k, x.shape[-1], self.features),
                           self.param_dtype)
            mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
            var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
            w = (w - mean) / jnp.sqrt(var + 1e-8)
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (self.stride, self.stride),
                ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(x)
        return nn.relu(x) if self.act else x


class _ResBackbone(nn.Module):
    """Truncatable bottleneck trunk feeding the hybrid patch embed."""
    layers: tuple = (2, 2, 2, 2)
    widths: tuple = (256, 512, 1024, 2048)
    bn: bool = False
    deep_stem: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(bn=self.bn, dtype=self.dtype,
                 param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.deep_stem:
            for i, ch in enumerate((32, 32, 64)):
                x = _StdConvGN(ch, 3, 2 if i == 0 else 1,
                               name=f"stem_{i}", **p)(x, deterministic)
        else:
            x = _StdConvGN(64, 7, 2, name="stem", **p)(x, deterministic)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for si, (depth, w) in enumerate(zip(self.layers, self.widths)):
            mid = w // 4
            for bi in range(depth):
                stride = 2 if si > 0 and bi == 0 else 1
                nm = f"s{si}_b{bi}"
                shortcut = x
                if x.shape[-1] != w or stride > 1:
                    shortcut = _StdConvGN(w, 1, stride, act=False,
                                          name=f"{nm}_down",
                                          **p)(x, deterministic)
                y = _StdConvGN(mid, 1, name=f"{nm}_c1",
                               **p)(x, deterministic)
                y = _StdConvGN(mid, 3, stride, name=f"{nm}_c2",
                               **p)(y, deterministic)
                y = _StdConvGN(w, 1, act=False, name=f"{nm}_c3",
                               **p)(y, deterministic)
                x = nn.relu(y + shortcut)
        return x


class VisionTransformerHybridV2(VisionTransformer):
    """ViT trunk over a configurable CNN backbone (reference
    vision_transformer_hybrid.py registry surface)."""
    backbone: str = "stem"   # 'stem'|'r26'|'r50_s16'|'r50_s32'|
    # 'resnet26d'|'resnet50d_s16'|'mci'
    backbone_patch: int = 1  # extra patchify stride after the backbone

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.backbone == "stem":
            x = x.astype(self.dtype)
            x = _StdConvGN(64, 7, 2, name="backbone_stem",
                           **p)(x, det)
        elif self.backbone == "r26":
            x = _ResBackbone((2, 2, 2, 2), (256, 512, 1024, 2048),
                             name="backbone", **p)(x, det)
        elif self.backbone == "r50_s16":
            x = _ResBackbone((3, 4, 9), (256, 512, 1024),
                             name="backbone", **p)(x, det)
        elif self.backbone == "r50_s32":
            x = _ResBackbone((3, 4, 6, 3), (256, 512, 1024, 2048),
                             name="backbone", **p)(x, det)
        elif self.backbone == "resnet26d":
            x = _ResBackbone((2, 2, 2), (256, 512, 1024), bn=True,
                             deep_stem=True, name="backbone", **p)(x, det)
        elif self.backbone == "resnet50d_s16":
            x = _ResBackbone((3, 4, 6), (256, 512, 1024), bn=True,
                             deep_stem=True, name="backbone", **p)(x, det)
        else:  # 'mci': MobileCLIP-style wide conv stem
            x = ConvStem(self.embed_dim, widths=(96, 192, 384),
                         name="backbone", **p)(x, det)
            x = x  # ConvStem already returns tokens
        if self.backbone != "mci":
            k = self.backbone_patch
            x = nn.Conv(self.embed_dim, (k, k), strides=k,
                        padding="VALID", name="patch_proj", **p)(x)
            bb, hh, ww, cc = x.shape
            x = x.reshape(bb, hh * ww, cc)
        n = x.shape[1]
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(
                             trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype),
                              (b, 1, self.embed_dim)), x], axis=1)
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(
                             trunc_init, (None, "seq", "embed")),
                         (1, n + 1, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, init_values=self.init_values,
                      drop_path_rate=dpr, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name=f"blocks_{i}")(x, det)
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        pooled = jnp.mean(x[:, 1:], axis=1) if self.global_pool == "avg" \
            else x[:, 0]
        if self.num_classes == 0:
            return pooled
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(pooled).astype(jnp.float32)


def _hybrid2(name, dim, depth, heads, backbone, patch=1, res=224):
    def build(**kw):
        for k in ("pretrained_tag", "scan_blocks", "remat", "patch_size",
                  "fc_norm"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        kw.setdefault("img_size", res)
        kw.setdefault("embed_dim", dim)
        kw.setdefault("depth", depth)
        kw.setdefault("num_heads", heads)
        kw.setdefault("global_pool", "token")
        return VisionTransformerHybridV2(backbone=backbone,
                                         backbone_patch=patch, **kw)

    build.__name__ = name
    build.__qualname__ = name
    build.__doc__ = (f"Hybrid ViT variant {name!r} (reference "
                     f"vision_transformer_hybrid.py registry surface).")
    import sys as _sys
    setattr(_sys.modules[__name__], name, register_model(build))


_hybrid2("vit_tiny_r_s16_p8_224", 192, 12, 3, "stem", patch=8)
_hybrid2("vit_tiny_r_s16_p8_384", 192, 12, 3, "stem", patch=8, res=384)
_hybrid2("vit_small_r26_s32_384", 384, 12, 6, "r26", res=384)
_hybrid2("vit_base_r26_s32_224", 768, 12, 12, "r26")
_hybrid2("vit_base_r50_s16_384", 768, 12, 12, "r50_s16", res=384)
_hybrid2("vit_large_r50_s32_224", 1024, 24, 16, "r50_s32")
_hybrid2("vit_large_r50_s32_384", 1024, 24, 16, "r50_s32", res=384)
_hybrid2("vit_small_resnet26d_224", 384, 12, 6, "resnet26d")
_hybrid2("vit_small_resnet50d_s16_224", 384, 12, 6, "resnet50d_s16")
_hybrid2("vit_base_resnet26d_224", 768, 12, 12, "resnet26d")
_hybrid2("vit_base_resnet50d_224", 768, 12, 12, "resnet50d_s16")
_hybrid2("vit_base_mci_224", 768, 12, 12, "mci")
