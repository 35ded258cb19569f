"""ViTamin in Flax, NHWC.

Parity with the reference's dormant vitamin.py (611 LoC; SURVEY §2.2):
a 3-stage hybrid — conv stem (3x3/s2 + LN2d+GELU + 3x3), two stages of
LayerNorm MBConv blocks (pre-norm, 1x1 expand x4, depthwise kxk, 1x1
project, avg-pool downsample shortcut), a strided-conv tokenizer, then a
ViT trunk whose MLPs are GeGLU at ratio 2 (norm + gated fc1 pair + fc2),
no class token, global average pooling.
"""
from __future__ import annotations

import sys
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.effnet_builder import (
    make_divisible,
)
from vision_transformers_torch_xla_tpu.models.layers import (
    Attention,
    _layer_norm,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _MbConvLN(nn.Module):
    """MbConvLNBlock (reference vitamin.py:151-196)."""
    out_chs: int
    stride: int = 1
    expand_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(nn.Conv, use_bias=True, padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        in_chs = x.shape[-1]
        mid = make_divisible(self.out_chs * self.expand_ratio)
        if self.stride == 2:
            shortcut = nn.avg_pool(x, (3, 3), strides=(2, 2),
                                   padding="SAME")
            shortcut = conv(self.out_chs, (1, 1),
                            name="shortcut_expand")(shortcut)
        elif in_chs != self.out_chs:
            shortcut = conv(self.out_chs, (1, 1), name="shortcut")(x)
        else:
            shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pre_norm")(x)
        y = nn.gelu(conv(mid, (1, 1), name="conv1")(y))
        y = conv(mid, (3, 3), strides=self.stride, feature_group_count=mid,
                 name="conv2_dw")(y)
        y = nn.gelu(y)
        y = conv(self.out_chs, (1, 1), name="conv3")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return shortcut + drop_path(y, self.drop_path_rate, deterministic,
                                    rng)


class _GeGluBlock(nn.Module):
    """ViT block with GeGLU MLP (reference vitamin.py GeGluMlp)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rngf = lambda: (None if deterministic or self.drop_path_rate == 0
                        else self.make_rng("droppath"))
        y = _layer_norm(self.dtype, self.param_dtype, "norm1")(x)
        y = Attention(self.num_heads, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="attn")(
            y, deterministic)
        x = x + drop_path(y, self.drop_path_rate, deterministic, rngf())
        y = _layer_norm(self.dtype, self.param_dtype, "norm2")(x)
        hid = int(self.dim * self.mlp_ratio)
        dense = partial(nn.Dense, dtype=self.dtype,
                        param_dtype=self.param_dtype)
        g = nn.gelu(dense(hid, name="mlp_fc1_g")(y))
        v = dense(hid, name="mlp_fc1_x")(y)
        y = dense(self.dim, name="mlp_fc2")(g * v)
        return x + drop_path(y, self.drop_path_rate, deterministic, rngf())


class ViTamin(nn.Module):
    conv_dims: Tuple[int, int] = (160, 320)
    conv_depths: Tuple[int, int] = (2, 4)
    stem_width: int = 160
    embed_dim: int = 1024
    depth: int = 31
    num_heads: int = 16
    mlp_ratio: float = 2.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        conv = partial(nn.Conv, use_bias=True, padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        # stem (reference vitamin.py:81-105)
        x = conv(self.stem_width, (3, 3), strides=2, name="stem_conv1")(x)
        x = nn.gelu(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="stem_norm1")(x))
        x = conv(self.stem_width, (3, 3), name="stem_conv2")(x)
        # two MBConv-LN stages
        for si, (dim, depth) in enumerate(zip(self.conv_dims,
                                              self.conv_depths)):
            for bi in range(depth):
                x = _MbConvLN(dim, stride=2 if bi == 0 else 1,
                              dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"s{si}_b{bi}")(x, det)
        # strided-conv tokenizer to the ViT dim (norm over C then conv)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pe_norm")(x)
        x = conv(self.embed_dim, (3, 3), strides=2, name="pe_proj")(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(
                             trunc_init, (None, "seq", "embed")),
                         (1, h * w, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = _GeGluBlock(self.embed_dim, self.num_heads,
                            self.mlp_ratio, float(dpr[i]),
                            dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"blocks_{i}")(x, det)
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        x = x.mean(axis=1)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _vitamin(conv_dims, stem, dim, depth, heads, res):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "patch_size", "fc_norm"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        kw.setdefault("img_size", res)
        kw.setdefault("conv_dims", conv_dims)
        kw.setdefault("stem_width", stem)
        kw.setdefault("embed_dim", dim)
        kw.setdefault("depth", depth)
        kw.setdefault("num_heads", heads)
        return ViTamin(**kw)

    return build


_V = {}
_V["vitamin_small_224"] = _vitamin((64, 128), 64, 384, 14, 6, 224)
_V["vitamin_base_224"] = _vitamin((128, 256), 128, 768, 14, 12, 224)
for _res in (224, 256, 336, 384):
    _V[f"vitamin_large_{_res}"] = _vitamin((160, 320), 160, 1024, 31, 16,
                                           _res)
    _V[f"vitamin_large2_{_res}"] = _vitamin((160, 320), 160, 1024, 31, 16,
                                            _res)
for _res in (256, 336, 384):
    _V[f"vitamin_xlarge_{_res}"] = _vitamin((192, 384), 192, 1152, 32, 16,
                                            _res)

_mod = sys.modules[__name__]
for _name, _fn in _V.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"ViTamin variant {_name!r} (reference vitamin.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
