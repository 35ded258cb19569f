"""MobileViT v1/v2 in Flax, NHWC.

Parity with the reference's dormant mobilevit.py (681 LoC; SURVEY §2.2):
MobileNetV2-style inverted-residual stages interleaved with MobileViT
blocks — local conv representation, unfold into patch-position groups, a
small transformer across patches, fold back, project, and (v1) fuse with
the shortcut through a 3x3 conv. v2 replaces the transformer with
linear self-attention (reference mobilevit.py:272-340): a 1-channel
query softmaxed over patches forms a context vector that gates
relu(value) — O(N) instead of O(N^2).

TPU notes: unfold/fold are free reshaped transposes in NHWC; the v1
transformer batches (B·P) tiny sequences — large leading batch keeps the
MXU streaming; all convs are NHWC lax.conv (1x1s lower to matmuls).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import Block
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.silu(x) if self.act else x


class _InvertedResidual(nn.Module):
    """MV2 bottleneck: 1x1 expand -> dw 3x3 -> 1x1 linear (reference
    mobilevit.py:33-37 via byobnet 'bottle')."""

    features: int
    stride: int = 1
    bottle_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_chs = x.shape[-1]
        mid = _make_divisible(in_chs * self.bottle_ratio)
        y = _ConvNormAct(mid, 1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv1")(x, deterministic)
        y = _ConvNormAct(mid, 3, self.stride, groups=mid, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv2")(y, deterministic)
        y = _ConvNormAct(self.features, 1, act=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv3")(y, deterministic)
        if self.stride == 1 and in_chs == self.features:
            y = x + y
        return y


def _unfold(x, p):
    """(B, H, W, C) -> (B·p·p, nh·nw, C): one token per patch position."""
    b, h, w, c = x.shape
    nh, nw = h // p, w // p
    x = x.reshape(b, nh, p, nw, p, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * p * p, nh * nw, c)


def _fold(x, b, p, nh, nw):
    c = x.shape[-1]
    x = x.reshape(b, p, p, nh, nw, c).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, nh * p, nw * p, c)


class MobileVitBlock(nn.Module):
    """Reference mobilevit.py:165-270."""

    transformer_dim: int
    transformer_depth: int
    patch_size: int = 2
    num_heads: int = 4
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        b, h, w, c = x.shape
        p = self.patch_size
        y = _ConvNormAct(c, 3, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="conv_kxk")(x, deterministic)
        y = nn.Conv(self.transformer_dim, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv_1x1")(y)
        t = _unfold(y, p)
        for i in range(self.transformer_depth):
            t = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"transformer_{i}")(t, deterministic)
        t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(t)
        y = _fold(t, b, p, h // p, w // p)
        y = _ConvNormAct(c, 1, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="conv_proj")(y, deterministic)
        y = jnp.concatenate([shortcut, y], axis=-1)
        return _ConvNormAct(c, 3, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="conv_fusion")(y, deterministic)


class LinearSelfAttention(nn.Module):
    """O(N) separable attention (reference mobilevit.py:272-340).
    Input (B·P?, ...) here: (BP, N, C) tokens."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        qkv = nn.Dense(1 + 2 * d, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv_proj")(x)
        q, k, v = qkv[..., :1], qkv[..., 1:1 + d], qkv[..., 1 + d:]
        scores = jax.nn.softmax(q.astype(jnp.float32), axis=1).astype(x.dtype)
        ctx = jnp.sum(k * scores, axis=1, keepdims=True)       # (BP, 1, d)
        out = nn.relu(v) * ctx
        return nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="out_proj")(out)


class MobileVitV2Block(nn.Module):
    """Reference mobilevit.py:450-540."""

    transformer_dim: int
    transformer_depth: int
    patch_size: int = 2
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        p = self.patch_size
        d = self.transformer_dim
        y = _ConvNormAct(c, 3, groups=c, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="conv_kxk")(x, deterministic)
        y = nn.Conv(d, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_1x1")(y)
        t = _unfold(y, p)                                    # (BP, N, d)
        gn = dict(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        for i in range(self.transformer_depth):
            a = nn.GroupNorm(**gn, name=f"transformer_{i}_norm1")(t)
            t = t + LinearSelfAttention(d, dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=f"transformer_{i}_attn")(a)
            m = nn.GroupNorm(**gn, name=f"transformer_{i}_norm2")(t)
            m = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"transformer_{i}_fc1")(m)
            m = nn.silu(m)
            t = t + nn.Dense(d, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"transformer_{i}_fc2")(m)
        t = nn.GroupNorm(**gn, name="norm")(t)
        y = _fold(t, b, p, h // p, w // p)
        return _ConvNormAct(c, 1, act=False, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="conv_proj")(y, deterministic)


class MobileVit(nn.Module):
    """Stage-spec-driven MobileViT v1/v2 trunk (reference
    mobilevit.py:88-162 model_cfgs)."""

    num_classes: int = 1000
    stem_chs: int = 16
    stages: Sequence = ()
    num_features: Optional[int] = None
    v2: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = _ConvNormAct(self.stem_chs, 3, 2, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="stem")(x.astype(self.dtype), deterministic)
        for si, (d, c, s, br, tdim, tdepth) in enumerate(self.stages):
            for j in range(d):
                x = _InvertedResidual(c, s if j == 0 else 1, br,
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name=f"stages_{si}_mv2_{j}")(x, deterministic)
            if tdim:
                blk = MobileVitV2Block if self.v2 else MobileVitBlock
                x = blk(tdim, tdepth, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"stages_{si}_vit")(x, deterministic)
        if self.num_features:
            x = _ConvNormAct(self.num_features, 1, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="final_conv")(x, deterministic)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _mobilevit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return MobileVit(**merged)

    return build


def _v2_cfg(mult):
    c = [_make_divisible(v * mult) for v in (64, 128, 256, 384, 512)]
    td = [_make_divisible(0.5 * ci) for ci in c]
    return dict(
        stem_chs=_make_divisible(32 * mult), v2=True,
        stages=(
            (1, c[0], 1, 2.0, 0, 0),
            (2, c[1], 2, 2.0, 0, 0),
            (1, c[2], 2, 2.0, td[2], 2),
            (1, c[3], 2, 2.0, td[3], 4),
            (1, c[4], 2, 2.0, td[4], 3),
        ))


# stage tuple: (mv2_depth, chs, stride, bottle_ratio, vit_dim, vit_depth)
_VARIANTS = {
    "mobilevit_xxs": dict(stem_chs=16, num_features=320, stages=(
        (1, 16, 1, 2.0, 0, 0), (3, 24, 2, 2.0, 0, 0),
        (1, 48, 2, 2.0, 64, 2), (1, 64, 2, 2.0, 80, 4),
        (1, 80, 2, 2.0, 96, 3))),
    "mobilevit_xs": dict(stem_chs=16, num_features=384, stages=(
        (1, 32, 1, 4.0, 0, 0), (3, 48, 2, 4.0, 0, 0),
        (1, 64, 2, 4.0, 96, 2), (1, 80, 2, 4.0, 120, 4),
        (1, 96, 2, 4.0, 144, 3))),
    "mobilevit_s": dict(stem_chs=16, num_features=640, stages=(
        (1, 32, 1, 4.0, 0, 0), (3, 64, 2, 4.0, 0, 0),
        (1, 96, 2, 4.0, 144, 2), (1, 128, 2, 4.0, 192, 4),
        (1, 160, 2, 4.0, 240, 3))),
    "mobilevitv2_050": _v2_cfg(0.50),
    "mobilevitv2_075": _v2_cfg(0.75),
    "mobilevitv2_100": _v2_cfg(1.00),
    "mobilevitv2_125": _v2_cfg(1.25),
    "mobilevitv2_150": _v2_cfg(1.50),
    "mobilevitv2_175": _v2_cfg(1.75),
    "mobilevitv2_200": _v2_cfg(2.00),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _mobilevit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MobileViT variant {_name!r} (reference mobilevit.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
