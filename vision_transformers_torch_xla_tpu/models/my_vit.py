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

# default-cfg parity with reference models/my_vit.py:11-55 (aliases the timm
# tiny/small/base/large cfgs: 224px, 0.9 crop, bicubic, ImageNet norm)
_DEFAULT_CFG = dict(input_size=(3, 224, 224), crop_pct=0.9,
                    interpolation="bicubic", num_classes=1000,
                    mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                    pool="avg")


def _my_vit(_dim, _depth, _heads, **kwargs):
    kwargs.pop("pretrained_tag", None)
    kwargs.setdefault("patch_size", 16)
    kwargs.setdefault("embed_dim", _dim)
    kwargs.setdefault("depth", _depth)
    kwargs.setdefault("num_heads", _heads)
    return VisionTransformer(**kwargs)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_mini(**kw):
    return _my_vit(144, 12, 3, **kw)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_ti(**kw):
    return _my_vit(192, 12, 3, **kw)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_xs(**kw):
    return _my_vit(288, 12, 4, **kw)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_s(**kw):
    return _my_vit(384, 12, 6, **kw)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_b(**kw):
    return _my_vit(768, 12, 12, **kw)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_l(**kw):
    return _my_vit(1024, 24, 16, **kw)


@register_model(default_cfg=_DEFAULT_CFG)
def my_vit_m(**kw):
    """Medium alias from the reference's stale dev copy ('my_vit copy.py':
    embed 480, depth 12, heads 8) — registered there, so kept for name
    parity."""
    return _my_vit(480, 12, 8, **kw)
