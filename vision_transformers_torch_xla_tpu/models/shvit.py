"""SHViT (Single-Head ViT) in Flax, NHWC.

Parity with the reference's dormant shvit.py (~540 LoC; SURVEY §2.2):
16x four-conv stem, three stages whose blocks are residual dw3x3 +
single-head self-attention over only a partial channel slice (pdim; the
rest passes through; GroupNorm pre-norm, BN-fused qkv conv) + residual
2x conv FFN (reference shvit.py:157-250). Stage transitions sandwich a
SE PatchMerging between dw/FFN residual pairs. BN+Linear head.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
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


class _FFN(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.relu(_ConvNorm(self.hidden, name="pw1",
                              **p)(x, deterministic))
        return _ConvNorm(c, bn_weight_init=0.0, name="pw2",
                         **p)(y, deterministic)


class _SHSA(nn.Module):
    """Single-head attention on a partial channel slice."""

    qk_dim: int
    pdim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        pd = self.pdim
        qk = self.qk_dim
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x1, x2 = x[..., :pd], x[..., pd:]
        x1n = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="pre_norm")(x1)
        t = _ConvNorm(2 * qk + pd, name="qkv", **p)(x1n, deterministic)
        q, k, v = t[..., :qk], t[..., qk:2 * qk], t[..., 2 * qk:]
        n = hh * ww
        q = q.reshape(b, n, qk)
        k = k.reshape(b, n, qk)
        v = v.reshape(b, n, pd)
        attn = jnp.einsum("bqd,bkd->bqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (qk ** -0.5), axis=-1)
        o = jnp.einsum("bqk,bkd->bqd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.reshape(b, hh, ww, pd)
        y = nn.relu(jnp.concatenate([o, x2], axis=-1))
        return _ConvNorm(c, bn_weight_init=0.0, name="proj",
                         **p)(y, deterministic)


class SHViT(nn.Module):
    """Reference shvit.py:253-400 (SHViT)."""

    num_classes: int = 1000
    embed_dim: Sequence[int] = (128, 256, 384)
    partial_dim: Sequence[int] = (32, 64, 96)
    qk_dim: Sequence[int] = (16, 16, 16)
    depth: Sequence[int] = (1, 2, 3)
    types: Sequence[str] = ("s", "s", "s")
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

        for si, dim in enumerate(self.embed_dim):
            if x.shape[-1] != dim:
                prev = x.shape[-1]
                x = x + _ConvNorm(prev, 3, groups=prev,
                                  name=f"down{si}_dw1", **p)(x, det)
                x = x + _FFN(prev * 2, name=f"down{si}_ffn1", **p)(x, det)
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
                x = x + _FFN(dim * 2, name=f"down{si}_ffn2", **p)(x, det)
            for j in range(self.depth[si]):
                nm = f"s{si}_b{j}"
                x = x + _ConvNorm(dim, 3, groups=dim, bn_weight_init=0.0,
                                  name=f"{nm}_conv", **p)(x, det)
                if self.types[si] == "s":
                    x = x + _SHSA(self.qk_dim[si], self.partial_dim[si],
                                  name=f"{nm}_mixer", **p)(x, det)
                x = x + _FFN(dim * 2, name=f"{nm}_ffn", **p)(x, det)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_bn")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _shvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return SHViT(**merged)

    return build


_VARIANTS = {
    "shvit_s1": dict(embed_dim=(128, 224, 320), depth=(2, 4, 5),
                     partial_dim=(32, 48, 68), types=("i", "s", "s")),
    "shvit_s2": dict(embed_dim=(128, 308, 448), depth=(2, 4, 5),
                     partial_dim=(32, 66, 96), types=("i", "s", "s")),
    "shvit_s3": dict(embed_dim=(192, 352, 448), depth=(3, 5, 5),
                     partial_dim=(48, 75, 96), types=("i", "s", "s")),
    "shvit_s4": dict(embed_dim=(224, 336, 448), depth=(4, 7, 6),
                     partial_dim=(48, 72, 96), types=("i", "s", "s")),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _shvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"SHViT variant {_name!r} (reference shvit.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
