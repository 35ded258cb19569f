"""SelecSls in Flax, NHWC.

Parity with the reference's dormant selecsls.py (377 LoC; SURVEY §2.2):
blocks run three conv pairs whose intermediate outputs concatenate into
a 1x1 fuse; the first block of each stride group resets the cross-block
skip, later blocks append it to the concat (selective short/long-range
skips, reference selecsls.py:79-107). Conv-BN-ReLU head pyramid.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

_FEATURES = {
    "selecsls42": (
        (32, 0, 64, 64, True, 2), (64, 64, 64, 128, False, 1),
        (128, 0, 144, 144, True, 2), (144, 144, 144, 288, False, 1),
        (288, 0, 304, 304, True, 2), (304, 304, 304, 480, False, 1)),
    "selecsls60": (
        (32, 0, 64, 64, True, 2), (64, 64, 64, 128, False, 1),
        (128, 0, 128, 128, True, 2), (128, 128, 128, 128, False, 1),
        (128, 128, 128, 288, False, 1), (288, 0, 288, 288, True, 2),
        (288, 288, 288, 288, False, 1), (288, 288, 288, 288, False, 1),
        (288, 288, 288, 416, False, 1)),
    "selecsls84": (
        (32, 0, 64, 64, True, 2), (64, 64, 64, 144, False, 1),
        (144, 0, 144, 144, True, 2), (144, 144, 144, 144, False, 1),
        (144, 144, 144, 144, False, 1), (144, 144, 144, 144, False, 1),
        (144, 144, 144, 304, False, 1), (304, 0, 304, 304, True, 2),
        (304, 304, 304, 304, False, 1), (304, 304, 304, 304, False, 1),
        (304, 304, 304, 304, False, 1), (304, 304, 304, 304, False, 1),
        (304, 304, 304, 512, False, 1)),
}
_HEADS = {
    "selecsls42": ((960, 3, 2), (1024, 3, 1), (1024, 3, 2), (1280, 1, 1)),
    "selecsls42b": ((960, 3, 2), (1024, 3, 1), (1280, 3, 2), (1024, 1, 1)),
    "selecsls60": ((756, 3, 2), (1024, 3, 1), (1024, 3, 2), (1280, 1, 1)),
    "selecsls60b": ((756, 3, 2), (1024, 3, 1), (1280, 3, 2), (1024, 1, 1)),
    "selecsls84": ((960, 3, 2), (1024, 3, 1), (1024, 3, 2), (1280, 3, 1)),
}


class SelecSls(nn.Module):
    """Reference selecsls.py:109-180 (SelecSls)."""

    num_classes: int = 1000
    features: Sequence = _FEATURES["selecsls42"]
    head: Sequence = _HEADS["selecsls42b"]
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def conv_bn(y, feats, k, s, name):
            y = nn.Conv(feats, (k, k), strides=(s, s),
                        padding=((k // 2, k // 2),) * 2, use_bias=False,
                        name=f"{name}_conv", **p)(y)
            y = nn.BatchNorm(use_running_average=det, momentum=0.9,
                             epsilon=1e-5, name=f"{name}_bn", **p)(y)
            return nn.relu(y)

        x = conv_bn(x.astype(self.dtype), 32, 3, 2, "stem")
        skip = None
        for bi, (in_c, skip_c, mid, out, is_first,
                 stride) in enumerate(self.features):
            nm = f"b{bi}"
            d1 = conv_bn(x, mid, 3, stride, f"{nm}_c1")
            d2 = conv_bn(conv_bn(d1, mid, 1, 1, f"{nm}_c2"), mid // 2, 3,
                         1, f"{nm}_c3")
            d3 = conv_bn(conv_bn(d2, mid, 1, 1, f"{nm}_c4"), mid // 2, 3,
                         1, f"{nm}_c5")
            if is_first:
                x = conv_bn(jnp.concatenate([d1, d2, d3], axis=-1), out,
                            1, 1, f"{nm}_c6")
                skip = x
            else:
                x = conv_bn(jnp.concatenate([d1, d2, d3, skip], axis=-1),
                            out, 1, 1, f"{nm}_c6")

        for hi, (feats, k, s) in enumerate(self.head):
            x = conv_bn(x, feats, k, s, f"head{hi}")
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="fc",
                        **p)(x).astype(jnp.float32)


def _selecsls(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return SelecSls(**merged)

    return build


_VARIANTS = {
    "selecsls42": dict(features=_FEATURES["selecsls42"],
                       head=_HEADS["selecsls42"]),
    "selecsls42b": dict(features=_FEATURES["selecsls42"],
                        head=_HEADS["selecsls42b"]),
    "selecsls60": dict(features=_FEATURES["selecsls60"],
                       head=_HEADS["selecsls60"]),
    "selecsls60b": dict(features=_FEATURES["selecsls60"],
                        head=_HEADS["selecsls60b"]),
    "selecsls84": dict(features=_FEATURES["selecsls84"],
                       head=_HEADS["selecsls84"]),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _selecsls(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"SelecSls variant {_name!r} (reference selecsls.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
