"""PiT (Pooling-based Vision Transformer) in Flax.

Parity with the reference's dormant pit.py (~500 LoC; SURVEY §2.2):
overlapping conv stem (k=patch, s=stride), learned 2D pos embed, then
three transformer stages; between stages a Pooling step halves the
spatial grid with a stride-2 depthwise conv (channel multiplier doubles
width) while a linear layer maps the cls token(s) (reference
pit.py:95-114, 143-230). Distilled variants carry a second token and
average the two heads at inference (DeiT semantics).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Block,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class PoolingVisionTransformer(nn.Module):
    """Reference pit.py:143-230 (PoolingVisionTransformer)."""

    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    stride: int = 8
    base_dims: Sequence[int] = (48, 48, 48)
    depths: Sequence[int] = (2, 6, 4)
    heads: Sequence[int] = (2, 4, 8)
    mlp_ratio: float = 4.0
    distilled: bool = False
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        num_tokens = 2 if self.distilled else 1
        dim = self.base_dims[0] * self.heads[0]
        # overlapping conv stem (reference ConvEmbedding :116-140)
        x = nn.Conv(dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x.astype(self.dtype))
        b, gh, gw, _ = x.shape
        pos = self.param("pos_embed", trunc_init, (1, gh, gw, dim),
                         self.param_dtype)
        x = x + pos.astype(x.dtype)
        cls = self.param("cls_token", trunc_init, (1, num_tokens, dim),
                         self.param_dtype)
        cls = jnp.broadcast_to(cls.astype(x.dtype), (b, num_tokens, dim))

        total = sum(self.depths)
        done = 0
        for si, depth in enumerate(self.depths):
            dim = self.base_dims[si] * self.heads[si]
            if si > 0:
                # Pooling: stride-2 depthwise conv with channel multiplier
                # on the spatial map; linear on the cls tokens (ref :95-114)
                prev = x.shape[-1]
                x = nn.Conv(dim, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            feature_group_count=prev, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"pool_{si}_conv")(x)
                cls = nn.Dense(dim, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"pool_{si}_fc")(cls)
            b, gh, gw, _ = x.shape
            t = jnp.concatenate([cls, x.reshape(b, gh * gw, dim)], axis=1)
            for j in range(depth):
                dpr = self.drop_path_rate * (done + j) / max(total - 1, 1)
                t = Block(num_heads=self.heads[si],
                          mlp_ratio=self.mlp_ratio, drop_path_rate=dpr,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name=f"stages_{si}_blocks_{j}")(t, deterministic)
            done += depth
            cls, x = t[:, :num_tokens], t[:, num_tokens:].reshape(
                b, gh, gw, dim)

        cls = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm")(cls)
        if self.num_classes == 0:
            return cls[:, 0]
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="head")(cls[:, 0]).astype(jnp.float32)
        if self.distilled:
            dist = nn.Dense(self.num_classes, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="head_dist")(cls[:, 1]).astype(jnp.float32)
            return (logits + dist) / 2
        return logits


def _pit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return PoolingVisionTransformer(**merged)

    return build


_VARIANTS = {
    "pit_ti_224": dict(patch_size=16, stride=8, base_dims=(32, 32, 32),
                       depths=(2, 6, 4), heads=(2, 4, 8)),
    "pit_xs_224": dict(patch_size=16, stride=8, base_dims=(48, 48, 48),
                       depths=(2, 6, 4), heads=(2, 4, 8)),
    "pit_s_224": dict(patch_size=16, stride=8, base_dims=(48, 48, 48),
                      depths=(2, 6, 4), heads=(3, 6, 12)),
    "pit_b_224": dict(patch_size=14, stride=7, base_dims=(64, 64, 64),
                      depths=(3, 6, 4), heads=(4, 8, 16)),
    "pit_ti_distilled_224": dict(patch_size=16, stride=8,
                                 base_dims=(32, 32, 32), depths=(2, 6, 4),
                                 heads=(2, 4, 8), distilled=True),
    "pit_xs_distilled_224": dict(patch_size=16, stride=8,
                                 base_dims=(48, 48, 48), depths=(2, 6, 4),
                                 heads=(2, 4, 8), distilled=True),
    "pit_s_distilled_224": dict(patch_size=16, stride=8,
                                base_dims=(48, 48, 48), depths=(2, 6, 4),
                                heads=(3, 6, 12), distilled=True),
    "pit_b_distilled_224": dict(patch_size=14, stride=7,
                                base_dims=(64, 64, 64), depths=(3, 6, 4),
                                heads=(4, 8, 16), distilled=True),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _pit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"PiT variant {_name!r} (reference pit.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
