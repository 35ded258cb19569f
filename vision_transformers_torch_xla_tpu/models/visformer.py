"""Visformer (Vision-friendly Transformer) in Flax, NHWC.

Parity with the reference's dormant visformer.py (~520 LoC; SURVEY §2.2):
conv stem (7x7 s2) then three stages separated by conv patch embeds —
stage 1 runs attention-free "spatial conv" blocks (1x1 expand, grouped
3x3, 1x1 project), stages 2/3 run BatchNorm-normed transformer blocks
whose MLP keeps the grouped spatial conv. All norms are BatchNorm2d;
position embeddings are per-stage 2D maps (reference
visformer.py:161-380).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _Bn(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class VisformerBlock(nn.Module):
    dim: int
    num_heads: int
    head_dim_ratio: float = 1.0
    mlp_ratio: float = 4.0
    group: int = 8
    attn_disabled: bool = False
    spatial_conv: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.dim
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if not self.attn_disabled:
            y = _Bn(name="norm1", **p)(x, deterministic)
            b, hh, ww, _ = y.shape
            hd = round(c // self.num_heads * self.head_dim_ratio)
            inner = hd * self.num_heads
            qkv = nn.Conv(3 * inner, (1, 1), use_bias=False, name="qkv",
                          **p)(y)
            qkv = qkv.reshape(b, hh * ww, 3, self.num_heads, hd)
            qkv = qkv.transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            pr = jax.nn.softmax(s * hd ** -0.5, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", pr, v,
                           preferred_element_type=jnp.float32)
            o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(
                b, hh, ww, inner)
            o = nn.Conv(c, (1, 1), use_bias=False, name="proj", **p)(o)
            x = x + o
        y = _Bn(name="norm2", **p)(x, deterministic)
        if self.spatial_conv:
            hidden = c * 2 if self.group >= 2 else c * 5 // 6
        else:
            hidden = int(c * self.mlp_ratio)
        y = nn.Conv(hidden, (1, 1), use_bias=False, name="mlp_conv1",
                    **p)(y)
        y = nn.gelu(y)
        if self.spatial_conv:
            y = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=self.group, use_bias=False,
                        name="mlp_conv2", **p)(y)
            y = nn.gelu(y)
        y = nn.Conv(c, (1, 1), use_bias=False, name="mlp_conv3", **p)(y)
        return x + y


class Visformer(nn.Module):
    """Reference visformer.py:161-430 (Visformer)."""

    num_classes: int = 1000
    init_channels: int = 32
    embed_dim: int = 384
    depths: Sequence[int] = (7, 4, 4)
    num_heads: int = 6
    mlp_ratio: float = 4.0
    group: int = 8
    attn_stage: str = "011"
    spatial_conv: str = "100"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.embed_dim
        x = x.astype(self.dtype)
        x = nn.Conv(self.init_channels, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    name="stem", **p)(x)
        x = nn.relu(_Bn(name="stem_bn", **p)(x, deterministic))

        dims = (d // 2, d, d * 2)
        ratios = (0.5, 1.0, 1.0)
        patch = (4, 2, 2)
        for si in range(3):
            x = nn.Conv(dims[si], (patch[si], patch[si]),
                        strides=(patch[si], patch[si]), padding="VALID",
                        name=f"patch_embed{si + 1}", **p)(x)
            x = _Bn(name=f"embed_norm{si + 1}", **p)(x, deterministic)
            pos = self.param(f"pos_embed{si + 1}",
                             nn.initializers.normal(0.02),
                             (1, x.shape[1], x.shape[2], dims[si]),
                             self.param_dtype)
            x = x + pos.astype(x.dtype)
            for j in range(self.depths[si]):
                x = VisformerBlock(
                    dims[si], self.num_heads, ratios[si], self.mlp_ratio,
                    self.group,
                    attn_disabled=self.attn_stage[si] == "0",
                    spatial_conv=self.spatial_conv[si] == "1",
                    name=f"stage{si + 1}_{j}", **p)(x, deterministic)

        x = _Bn(name="norm", **p)(x, deterministic)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _visformer(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Visformer(**merged)

    return build


_VARIANTS = {
    "visformer_tiny": dict(init_channels=16, embed_dim=192,
                           depths=(7, 4, 4), num_heads=3, group=8),
    "visformer_small": dict(init_channels=32, embed_dim=384,
                            depths=(7, 4, 4), num_heads=6, group=8),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _visformer(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Visformer variant {_name!r} (reference visformer.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
