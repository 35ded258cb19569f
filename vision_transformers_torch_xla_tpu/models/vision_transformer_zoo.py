"""Registered ViT variants.

Name/config parity with the timm variants the reference CLI can actually
reach (reference models/vision_transformer.py:2691+; the trainer gates model
names to vit*/convnext*, reference main.py:633-651). Each entrypoint mirrors
the timm config (embed_dim / depth / heads / patch / resolution) and returns
an uninitialized Flax module.
"""
from __future__ import annotations

from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer

__all__ = []


def _vit(_patch, _dim, _depth, _heads, img_size=224, **kwargs):
    kwargs.pop("pretrained_tag", None)
    kwargs.setdefault("img_size", img_size)
    kwargs.setdefault("patch_size", _patch)
    kwargs.setdefault("embed_dim", _dim)
    kwargs.setdefault("depth", _depth)
    kwargs.setdefault("num_heads", _heads)
    return VisionTransformer(**kwargs)


# --- patch16 @ 224 (reference vision_transformer.py:2691, 2716, 2772, 2828) ---
@register_model
def vit_tiny_patch16_224(**kw):
    return _vit(16, 192, 12, 3, **kw)


@register_model
def vit_small_patch16_224(**kw):
    return _vit(16, 384, 12, 6, **kw)


@register_model
def vit_base_patch16_224(**kw):
    return _vit(16, 768, 12, 12, **kw)


@register_model
def vit_large_patch16_224(**kw):
    return _vit(16, 1024, 24, 16, **kw)


@register_model
def vit_huge_patch14_224(**kw):
    return _vit(14, 1280, 32, 16, **kw)


# --- patch32 @ 224 ---
@register_model
def vit_tiny_patch32_224(**kw):
    return _vit(32, 192, 12, 3, **kw)


@register_model
def vit_small_patch32_224(**kw):
    return _vit(32, 384, 12, 6, **kw)


@register_model
def vit_base_patch32_224(**kw):
    return _vit(32, 768, 12, 12, **kw)


@register_model
def vit_large_patch32_224(**kw):
    return _vit(32, 1024, 24, 16, **kw)


# --- patch16 @ 384 ---
@register_model
def vit_tiny_patch16_384(**kw):
    return _vit(16, 192, 12, 3, img_size=384, **kw)


@register_model
def vit_small_patch16_384(**kw):
    return _vit(16, 384, 12, 6, img_size=384, **kw)


@register_model
def vit_base_patch16_384(**kw):
    return _vit(16, 768, 12, 12, img_size=384, **kw)


@register_model
def vit_large_patch16_384(**kw):
    return _vit(16, 1024, 24, 16, img_size=384, **kw)
