"""EfficientViT (MIT) in Flax, NHWC.

Parity with the reference's dormant efficientvit_mit.py (1193 LoC; SURVEY
§2.2): the b0-b3 / l1-l3 surface built from DSConv stem blocks, MBConv
conv stages, and EfficientVitBlocks whose context module is LiteMLA —
lightweight multi-scale linear attention: 1x1 qkv, a 5x5 grouped
aggregation branch, ReLU kernel feature maps, and the linear
(k^T v)-then-q associativity trick with a ones-padded denominator
channel. Linear attention is O(N) in tokens and lands on the MXU as two
small matmuls per head — a good TPU fit.

Wide two-layer classifier heads (head_widths) follow the reference.
The l-series uses the same machinery with GELU activations (reference
EfficientVitLargeStage's fused-MBConv early stages are realised as
standard MBConv here; widths/depths match).
"""
from __future__ import annotations

import sys
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


class _CNA(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    bias: bool = False
    norm: bool = True
    act: str = ""          # '' | 'hswish' | 'relu' | 'gelu'
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k), strides=self.stride,
                    padding="SAME", feature_group_count=self.groups,
                    use_bias=self.bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="bn")(x)
        if self.act == "hswish":
            x = _hswish(x)
        elif self.act == "relu":
            x = nn.relu(x)
        elif self.act == "gelu":
            x = nn.gelu(x, approximate=True)
        return x


class _LiteMLA(nn.Module):
    """Lightweight multi-scale linear attention (reference :269-365)."""
    dim: int               # head dim
    act: str = "hswish"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        heads = max(1, C // self.dim)
        td = heads * self.dim
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = _CNA(3 * td, 1, norm=False, name="qkv", **p)(x, deterministic)
        # multi-scale aggregation branch: 5x5 depthwise + grouped 1x1
        agg = nn.Conv(3 * td, (5, 5), padding="SAME",
                      feature_group_count=3 * td, use_bias=False,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="aggreg_dw")(qkv)
        agg = nn.Conv(3 * td, (1, 1), feature_group_count=3 * heads,
                      use_bias=False, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="aggreg_pw")(agg)
        ms = jnp.concatenate([qkv, agg], axis=-1)
        ms = ms.reshape(B, H * W, -1, 3 * self.dim)     # (B, N, 2*heads, 3d)
        q, k, v = jnp.split(ms, 3, axis=-1)
        q = nn.relu(q).astype(jnp.float32)
        k = nn.relu(k).astype(jnp.float32)
        v = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, 0), (0, 0),
                                            (0, 1)), constant_values=1.0)
        # linear attention: q (k^T v) with a ones channel as denominator
        kv = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bnhd,bhde->bnhe", q, kv)
        out = out[..., :-1] / (out[..., -1:] + 1e-5)
        out = out.astype(x.dtype).reshape(B, H, W, -1)
        return _CNA(C, 1, name="proj", **p)(out, deterministic)


class _MBConv(nn.Module):
    out_chs: int
    stride: int = 1
    expand: float = 4.0
    act: str = "hswish"
    fused_norm: bool = True  # norm on the projection conv
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        in_chs = x.shape[-1]
        mid = int(round(in_chs * self.expand))
        y = _CNA(mid, 1, act=self.act, name="inverted",
                 **p)(x, deterministic)
        y = _CNA(mid, 3, stride=self.stride, groups=mid, act=self.act,
                 name="depthwise", **p)(y, deterministic)
        y = _CNA(self.out_chs, 1, norm=self.fused_norm, name="point",
                 **p)(y, deterministic)
        if self.stride == 1 and in_chs == self.out_chs:
            y = y + x
        return y


class _DSConv(nn.Module):
    out_chs: int
    act: str = "hswish"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        in_chs = x.shape[-1]
        y = _CNA(in_chs, 3, groups=in_chs, act=self.act, name="depthwise",
                 **p)(x, deterministic)
        y = _CNA(self.out_chs, 1, name="point", **p)(y, deterministic)
        if in_chs == self.out_chs:
            y = y + x
        return y


class EfficientVitMit(nn.Module):
    widths: Tuple[int, ...] = (8, 16, 32, 64, 128)
    depths: Tuple[int, ...] = (1, 2, 2, 2, 2)
    head_dim: int = 16
    head_widths: Tuple[int, int] = (1024, 1280)
    act: str = "hswish"      # 'hswish' (b) | 'gelu' (l)
    num_classes: int = 1000
    drop_rate: float = 0.0
    img_size: int = 224
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = _CNA(self.widths[0], 3, stride=2, act=self.act, name="stem_in",
                 **p)(x, det)
        for i in range(self.depths[0]):
            x = _DSConv(self.widths[0], act=self.act, name=f"stem_d{i}",
                        **p)(x, det)
        # stages 1-2: MBConv; stages 3-4: MBConv downsample + LiteMLA blocks
        for si in (1, 2):
            for bi in range(self.depths[si]):
                x = _MBConv(self.widths[si], stride=2 if bi == 0 else 1,
                            act=self.act, name=f"s{si}_b{bi}",
                            **p)(x, det)
        for si in (3, 4):
            x = _MBConv(self.widths[si], stride=2, act=self.act,
                        name=f"s{si}_down", **p)(x, det)
            for bi in range(self.depths[si]):
                nm = f"s{si}_b{bi}"
                x = x + _LiteMLA(self.head_dim, act=self.act, **p,
                                 name=f"{nm}_attn")(x, det)
                x = _MBConv(self.widths[si], act=self.act,
                            name=f"{nm}_local", **p)(x, det)
        x = _CNA(self.head_widths[0], 1, act=self.act, name="head_conv",
                 **p)(x, det)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.head_widths[1], dtype=self.dtype,
                     param_dtype=self.param_dtype, name="head_fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_ln")(x)
        x = _hswish(x) if self.act == "hswish" else nn.gelu(x)
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate)(x, deterministic=det)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _evit(widths, depths, head_dim, head_widths, act="hswish"):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        kw.setdefault("widths", widths)
        kw.setdefault("depths", depths)
        kw.setdefault("head_dim", head_dim)
        kw.setdefault("head_widths", head_widths)
        kw.setdefault("act", act)
        return EfficientVitMit(**kw)

    return build


_V = {
    "efficientvit_b0": _evit((8, 16, 32, 64, 128), (1, 2, 2, 2, 2), 16,
                             (1024, 1280)),
    "efficientvit_b1": _evit((16, 32, 64, 128, 256), (1, 2, 3, 3, 4), 16,
                             (1536, 1600)),
    "efficientvit_b2": _evit((24, 48, 96, 192, 384), (1, 3, 4, 4, 6), 32,
                             (2304, 2560)),
    "efficientvit_b3": _evit((32, 64, 128, 256, 512), (1, 4, 6, 6, 9), 32,
                             (2304, 2560)),
    "efficientvit_l1": _evit((32, 64, 128, 256, 512), (1, 1, 1, 6, 6), 32,
                             (3072, 3200), act="gelu"),
    "efficientvit_l2": _evit((32, 64, 128, 256, 512), (1, 2, 2, 8, 8), 32,
                             (3072, 3200), act="gelu"),
    "efficientvit_l3": _evit((64, 128, 256, 512, 1024), (1, 2, 2, 8, 8),
                             32, (6144, 6400), act="gelu"),
}

_mod = sys.modules[__name__]
for _name, _fn in _V.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"EfficientViT(MIT) variant {_name!r} (reference "
                   f"efficientvit_mit.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
