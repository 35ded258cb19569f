"""EfficientFormerV2 in Flax, NHWC.

Parity with the reference's dormant efficientformer_v2.py (~810 LoC;
SURVEY §2.2): 4-stage conv backbone whose last `num_vit` blocks of
stages 3/4 use Attention2d — LeViT-style conv-projected attention with
relative-position biases, talking-heads 1x1 convs across the head axis,
and a depthwise local-value branch; stage 3 computes attention at half
resolution (stride conv in, bilinear upsample out, reference
efficientformer_v2.py:91-183). Conv MLPs carry a mid depthwise conv.
Dual distillation heads averaged at inference. Attention downsamples
(reference :199-280) are simplified to their conv path.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

_WIDTH = {
    "L": (40, 80, 192, 384),
    "S2": (32, 64, 144, 288),
    "S1": (32, 48, 120, 224),
    "S0": (32, 48, 96, 176),
}
_DEPTH = {
    "L": (5, 5, 15, 10),
    "S2": (4, 4, 12, 8),
    "S1": (3, 3, 9, 6),
    "S0": (2, 2, 6, 4),
}
_EXP = {
    "L": (4, 4, (4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4),
          (4, 4, 4, 3, 3, 3, 3, 4, 4, 4)),
    "S2": (4, 4, (4, 4, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4),
           (4, 4, 3, 3, 3, 3, 4, 4)),
    "S1": (4, 4, (4, 4, 3, 3, 3, 3, 4, 4, 4), (4, 4, 3, 3, 4, 4)),
    "S0": (4, 4, (4, 3, 3, 3, 4, 4), (4, 3, 3, 4)),
}


class _ConvBn(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


def _rel_pos_idx(h, w):
    pos = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                               indexing="ij")).reshape(2, -1)
    rel = np.abs(pos[:, :, None] - pos[:, None, :])
    return (rel[0] * w + rel[1]).astype(np.int32)         # (N, N)


class Attention2d(nn.Module):
    """Reference efficientformer_v2.py:91-183."""

    dim: int
    key_dim: int = 32
    num_heads: int = 8
    attn_ratio: float = 4.0
    stride: int = 0                     # 0 = full res
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, h0, w0, c = x.shape
        if self.stride:
            x = _ConvBn(c, 3, self.stride, groups=c, name="stride_conv",
                        **p)(x, deterministic)
        b, hh, ww, _ = x.shape
        n = hh * ww
        heads = self.num_heads
        kd = self.key_dim
        d = int(self.attn_ratio * kd)
        dh = d * heads

        q = _ConvBn(kd * heads, name="q", **p)(x, deterministic)
        k = _ConvBn(kd * heads, name="k", **p)(x, deterministic)
        v = _ConvBn(dh, name="v", **p)(x, deterministic)
        v_local = _ConvBn(dh, 3, groups=dh, name="v_local",
                          **p)(v, deterministic)

        q = q.reshape(b, n, heads, kd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, heads, kd).transpose(0, 2, 1, 3)
        vr = v.reshape(b, n, heads, d).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (kd ** -0.5)
        idx = _rel_pos_idx(hh, ww)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (heads, hh * ww), self.param_dtype)
        attn = attn + biases[:, idx].astype(jnp.float32)
        # talking heads: 1x1 convs across the head axis
        th1 = self.param("talking_head1", nn.initializers.normal(0.02),
                         (heads, heads), self.param_dtype)
        attn = jnp.einsum("bhqk,hg->bgqk", attn,
                          th1.astype(jnp.float32))
        attn = jax.nn.softmax(attn, axis=-1)
        th2 = self.param("talking_head2", nn.initializers.normal(0.02),
                         (heads, heads), self.param_dtype)
        attn = jnp.einsum("bhqk,hg->bgqk", attn,
                          th2.astype(jnp.float32))
        o = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vr.dtype), vr,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, hh, ww, dh)
        o = o + v_local
        if self.stride:
            o = jax.image.resize(o, (b, h0, w0, dh), method="bilinear")
        o = nn.gelu(o)
        return _ConvBn(self.dim, name="proj", **p)(o, deterministic)


class EfficientFormerV2(nn.Module):
    """Reference efficientformer_v2.py:520-660."""

    num_classes: int = 1000
    depths: Sequence[int] = (2, 2, 6, 4)
    embed_dims: Sequence[int] = (32, 48, 96, 176)
    mlp_ratios: Sequence = (4, 4, (4, 3, 3, 3, 4, 4), (4, 3, 3, 4))
    num_vit: int = 2
    ls_init: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d0 = self.embed_dims[0]
        x = x.astype(self.dtype)
        x = nn.gelu(_ConvBn(d0 // 2, 3, 2, name="stem_0", **p)(x, det))
        x = nn.gelu(_ConvBn(d0, 3, 2, name="stem_1", **p)(x, det))

        def mlp(y, dim, ratio, nm):
            y = nn.gelu(_ConvBn(int(dim * ratio), name=f"{nm}_fc1",
                                **p)(y, det))
            y = nn.gelu(_ConvBn(int(dim * ratio), 3,
                                groups=int(dim * ratio),
                                name=f"{nm}_mid", **p)(y, det))
            return _ConvBn(dim, name=f"{nm}_fc2", **p)(y, det)

        def ls(name, dim, y):
            g = self.param(name, nn.initializers.constant(self.ls_init),
                           (dim,), self.param_dtype)
            return y * g.astype(y.dtype)

        for si, dim in enumerate(self.embed_dims):
            if si > 0:
                x = _ConvBn(dim, 3, 2, name=f"down{si}", **p)(x, det)
            ratios = self.mlp_ratios[si]
            for j in range(self.depths[si]):
                nm = f"s{si}_b{j}"
                ratio = (ratios[j] if isinstance(ratios, (tuple, list))
                         else ratios)
                use_attn = si >= 2 and j > self.depths[si] - self.num_vit - 1
                if use_attn:
                    a = Attention2d(dim, stride=2 if si == 2 else 0,
                                    name=f"{nm}_attn", **p)(x, det)
                    x = x + ls(f"{nm}_ls1", dim, a)
                x = x + ls(f"{nm}_ls2", dim,
                           mlp(x, dim, ratio, f"{nm}_mlp"))

        x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        logits = nn.Dense(self.num_classes, name="head",
                          **p)(x).astype(jnp.float32)
        dist = nn.Dense(self.num_classes, name="head_dist",
                        **p)(x).astype(jnp.float32)
        return (logits + dist) / 2


def _efv2(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return EfficientFormerV2(**merged)

    return build


_VARIANTS = {
    "efficientformerv2_s0": dict(depths=_DEPTH["S0"],
                                 embed_dims=_WIDTH["S0"],
                                 mlp_ratios=_EXP["S0"], num_vit=2),
    "efficientformerv2_s1": dict(depths=_DEPTH["S1"],
                                 embed_dims=_WIDTH["S1"],
                                 mlp_ratios=_EXP["S1"], num_vit=2),
    "efficientformerv2_s2": dict(depths=_DEPTH["S2"],
                                 embed_dims=_WIDTH["S2"],
                                 mlp_ratios=_EXP["S2"], num_vit=4),
    "efficientformerv2_l": dict(depths=_DEPTH["L"],
                                embed_dims=_WIDTH["L"],
                                mlp_ratios=_EXP["L"], num_vit=6),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _efv2(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"EfficientFormerV2 variant {_name!r} (reference "
                   f"efficientformer_v2.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
