"""EfficientViT (MSRA) in Flax, NHWC.

Parity with the reference's dormant efficientvit_msra.py (~720 LoC;
SURVEY §2.2): 16x conv stem, three stages with dual-conv/FFN sandwich
blocks around cascaded group attention — the channel split is fed
head-by-head, each head's output added to the next head's input, with
LeViT-style shared relative-position attention biases and a depthwise
conv on the query (reference efficientvit_msra.py:117-318). Subsample
stages use PatchMerging (1x1 expand, dw 3x3 s2, SE, 1x1 project).
"""
from __future__ import annotations

import itertools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ConvNorm(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    bn_weight_init: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-5,
                            scale_init=nn.initializers.constant(
                                self.bn_weight_init),
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class _ConvMlp(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = _ConvNorm(self.hidden, name="pw1", **p)(x, deterministic)
        y = nn.relu(y)
        return _ConvNorm(c, bn_weight_init=0.0, name="pw2",
                         **p)(y, deterministic)


def _bias_idxs(resolution: int) -> np.ndarray:
    pts = list(itertools.product(range(resolution), range(resolution)))
    offsets = {}
    idxs = []
    for p1 in pts:
        for p2 in pts:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(pts)
    return np.array(idxs, dtype=np.int32).reshape(n, n), len(offsets)


class CascadedGroupAttention(nn.Module):
    """Reference efficientvit_msra.py:117-209."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    kernels: Sequence[int]
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        kd = self.key_dim
        vd = int(self.attn_ratio * kd)
        h = self.num_heads
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        idxs, n_off = _bias_idxs(self.resolution)
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (h, n_off), self.param_dtype)
        n = hh * ww
        chunk = c // h
        feats = [x[..., i * chunk:(i + 1) * chunk] for i in range(h)]
        feat = feats[0]
        outs = []
        for hi in range(h):
            if hi > 0:
                feat = feat + feats[hi]
            t = _ConvNorm(2 * kd + vd, name=f"qkv_{hi}",
                          **p)(feat, deterministic)
            q, k, v = (t[..., :kd], t[..., kd:2 * kd], t[..., 2 * kd:])
            ks = self.kernels[hi]
            q = _ConvNorm(kd, ks, groups=kd, name=f"dws_{hi}",
                          **p)(q, deterministic)
            q = q.reshape(b, n, kd)
            k = k.reshape(b, n, kd)
            v = v.reshape(b, n, vd)
            attn = jnp.einsum("bqd,bkd->bqk", q, k,
                              preferred_element_type=jnp.float32)
            attn = attn * (kd ** -0.5)
            attn = attn + biases[hi][idxs].astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            feat = jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)
            feat = feat.reshape(b, hh, ww, vd)
            outs.append(feat)
        y = nn.relu(jnp.concatenate(outs, axis=-1))
        return _ConvNorm(self.dim, bn_weight_init=0.0, name="proj",
                         **p)(y, deterministic)


class EfficientVitMsra(nn.Module):
    """Reference efficientvit_msra.py:383-520 (EfficientVitMsra)."""

    num_classes: int = 1000
    img_size: int = 224
    embed_dim: Sequence[int] = (64, 128, 192)
    key_dim: Sequence[int] = (16, 16, 16)
    depth: Sequence[int] = (1, 2, 3)
    num_heads: Sequence[int] = (4, 4, 4)
    window_size: Sequence[int] = (7, 7, 7)
    kernels: Sequence[int] = (5, 5, 5, 5)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d0 = self.embed_dim[0]
        x = x.astype(self.dtype)
        for i, f in enumerate((d0 // 8, d0 // 4, d0 // 2, d0)):
            x = _ConvNorm(f, 3, 2, name=f"stem_{i}", **p)(x, det)
            if i < 3:
                x = nn.relu(x)

        res = self.img_size // 16
        for si, dim in enumerate(self.embed_dim):
            ar = dim / (self.key_dim[si] * self.num_heads[si])
            if si > 0:
                prev = self.embed_dim[si - 1]
                # pre/post residual conv+FFN sandwich around PatchMerging
                x = x + _ConvNorm(prev, 3, groups=prev,
                                  name=f"down{si}_dw1", **p)(x, det)
                x = x + _ConvMlp(prev * 2, name=f"down{si}_ffn1",
                                 **p)(x, det)
                hid = prev * 4
                y = nn.relu(_ConvNorm(hid, name=f"down{si}_pm1",
                                      **p)(x, det))
                y = nn.relu(_ConvNorm(hid, 3, 2, groups=hid,
                                      name=f"down{si}_pm2", **p)(y, det))
                s = jnp.mean(y, axis=(1, 2), keepdims=True)
                s = nn.relu(nn.Conv(hid // 4, (1, 1),
                                    name=f"down{si}_se_r", **p)(s))
                s = nn.Conv(hid, (1, 1), name=f"down{si}_se_e", **p)(s)
                y = y * jax.nn.sigmoid(
                    s.astype(jnp.float32)).astype(y.dtype)
                x = _ConvNorm(dim, name=f"down{si}_pm3", **p)(y, det)
                x = x + _ConvNorm(dim, 3, groups=dim,
                                  name=f"down{si}_dw2", **p)(x, det)
                x = x + _ConvMlp(dim * 2, name=f"down{si}_ffn2",
                                 **p)(x, det)
                res = (res - 1) // 2 + 1
            ws = min(self.window_size[si], res)
            for j in range(self.depth[si]):
                nm = f"s{si}_b{j}"
                x = x + _ConvNorm(dim, 3, groups=dim, bn_weight_init=0.0,
                                  name=f"{nm}_dw0", **p)(x, det)
                x = x + _ConvMlp(dim * 2, name=f"{nm}_ffn0", **p)(x, det)
                # windowed cascaded group attention
                b, hh, ww, c = x.shape
                if hh <= ws:
                    a = CascadedGroupAttention(
                        dim, self.key_dim[si], self.num_heads[si], ar,
                        hh, self.kernels, name=f"{nm}_attn", **p)(x, det)
                else:
                    ph = (-hh) % ws
                    pw = (-ww) % ws
                    y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                    hp, wp = hh + ph, ww + pw
                    nh, nw = hp // ws, wp // ws
                    y = y.reshape(b, nh, ws, nw, ws, c).transpose(
                        0, 1, 3, 2, 4, 5).reshape(b * nh * nw, ws, ws, c)
                    y = CascadedGroupAttention(
                        dim, self.key_dim[si], self.num_heads[si], ar,
                        ws, self.kernels, name=f"{nm}_attn", **p)(y, det)
                    y = y.reshape(b, nh, nw, ws, ws, c).transpose(
                        0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
                    a = y[:, :hh, :ww]
                x = x + a
                x = x + _ConvNorm(dim, 3, groups=dim, bn_weight_init=0.0,
                                  name=f"{nm}_dw1", **p)(x, det)
                x = x + _ConvMlp(dim * 2, name=f"{nm}_ffn1", **p)(x, det)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_bn")(x)
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _efficientvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return EfficientVitMsra(**merged)

    return build


_VARIANTS = {
    "efficientvit_m0": dict(embed_dim=(64, 128, 192), depth=(1, 2, 3),
                            num_heads=(4, 4, 4), kernels=(5, 5, 5, 5)),
    "efficientvit_m1": dict(embed_dim=(128, 144, 192), depth=(1, 2, 3),
                            num_heads=(2, 3, 3), kernels=(7, 5, 3, 3)),
    "efficientvit_m2": dict(embed_dim=(128, 192, 224), depth=(1, 2, 3),
                            num_heads=(4, 3, 2), kernels=(7, 5, 3, 3)),
    "efficientvit_m3": dict(embed_dim=(128, 240, 320), depth=(1, 2, 3),
                            num_heads=(4, 3, 4), kernels=(5, 5, 5, 5)),
    "efficientvit_m4": dict(embed_dim=(128, 256, 384), depth=(1, 2, 3),
                            num_heads=(4, 4, 4), kernels=(7, 5, 3, 3)),
    "efficientvit_m5": dict(embed_dim=(192, 288, 384), depth=(1, 3, 4),
                            num_heads=(3, 3, 4), kernels=(7, 5, 3, 3)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _efficientvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"EfficientViT-MSRA variant {_name!r} (reference "
                   f"efficientvit_msra.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
