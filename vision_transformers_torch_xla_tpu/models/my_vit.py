"""`my_vit_*` aliases — the names the reference launch scripts train.

Config parity with reference models/my_vit.py:84-165:

| name        | embed | depth | heads |
|-------------|-------|-------|-------|
| my_vit_mini | 144   | 12    | 3     |
| my_vit_ti   | 192   | 12    | 3     |
| my_vit_xs   | 288   | 12    | 4     |
| my_vit_s    | 384   | 12    | 6     |
| my_vit_b    | 768   | 12    | 12    |
| my_vit_l    | 1024  | 24    | 16    |
"""
from __future__ import annotations

from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer

__all__ = []


def _my_vit(_dim, _depth, _heads, **kwargs):
    kwargs.pop("pretrained_tag", None)
    kwargs.setdefault("patch_size", 16)
    kwargs.setdefault("embed_dim", _dim)
    kwargs.setdefault("depth", _depth)
    kwargs.setdefault("num_heads", _heads)
    return VisionTransformer(**kwargs)


@register_model
def my_vit_mini(**kw):
    return _my_vit(144, 12, 3, **kw)


@register_model
def my_vit_ti(**kw):
    return _my_vit(192, 12, 3, **kw)


@register_model
def my_vit_xs(**kw):
    return _my_vit(288, 12, 4, **kw)


@register_model
def my_vit_s(**kw):
    return _my_vit(384, 12, 6, **kw)


@register_model
def my_vit_b(**kw):
    return _my_vit(768, 12, 12, **kw)


@register_model
def my_vit_l(**kw):
    return _my_vit(1024, 24, 16, **kw)
