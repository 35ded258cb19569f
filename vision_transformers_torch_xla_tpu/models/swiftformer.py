"""SwiftFormer in Flax, NHWC.

Parity with the reference's dormant swiftformer.py (~615 LoC; SURVEY
§2.2): a 4-stage conv backbone (poolformer-style ConvEncoder blocks:
dw3x3 + BN + pw-expand + GELU + pw + LayerScale) whose last block per
stage is the SwiftFormer encoder — local representation then efficient
additive attention (normalized query projected onto a learned global
vector to form an O(N) context) and a conv MLP (reference
swiftformer.py:140-253). Dual classifier heads averaged at inference
(distillation checkpoints).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _Bn(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class _LayerScale(nn.Module):
    dim: int
    init: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", nn.initializers.constant(self.init),
                       (self.dim,), self.param_dtype)
        return x * g.astype(x.dtype)


class _ConvEncoder(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.dim, name="dw", **p)(x)
        y = _Bn(name="norm", **p)(y, deterministic)
        y = nn.Conv(self.hidden, (1, 1), name="pw1", **p)(y)
        y = nn.gelu(y)
        y = nn.Conv(self.dim, (1, 1), name="pw2", **p)(y)
        return x + _LayerScale(self.dim, 1.0, name="ls", **p)(y)


class _AdditiveAttention(nn.Module):
    """Reference swiftformer.py:140-170 (EfficientAdditiveAttention)."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        t = x.reshape(b, hh * ww, c)
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(c, name="to_query", **p)(t)
        k = nn.Dense(c, name="to_key", **p)(t)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        w_g = self.param("w_g", nn.initializers.normal(1.0), (c, 1),
                         self.param_dtype)
        a = (q @ w_g.astype(q.dtype)) * (c ** -0.5)        # (b, N, 1)
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-6)
        glob = jnp.sum(a * q, axis=1, keepdims=True)       # (b, 1, c)
        out = nn.Dense(c, name="proj", **p)(glob * k) + q
        out = nn.Dense(c, name="final", **p)(out)
        return out.reshape(b, hh, ww, c)


class SwiftFormer(nn.Module):
    """Reference swiftformer.py:313-430 (SwiftFormer)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 3, 6, 4)
    embed_dims: Sequence[int] = (48, 56, 112, 220)
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d0 = self.embed_dims[0]
        x = x.astype(self.dtype)
        x = nn.Conv(d0 // 2, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="stem0", **p)(x)
        x = nn.relu(_Bn(name="stem0_bn", **p)(x, deterministic))
        x = nn.Conv(d0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="stem1", **p)(x)
        x = nn.relu(_Bn(name="stem1_bn", **p)(x, deterministic))

        for si, dim in enumerate(self.embed_dims):
            if si > 0:
                x = nn.Conv(dim, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            name=f"down_{si}", **p)(x)
                x = _Bn(name=f"down_{si}_bn", **p)(x, deterministic)
            for j in range(self.layers[si]):
                if j == self.layers[si] - 1:
                    # SwiftFormer encoder block
                    y = nn.Conv(dim, (3, 3), padding=((1, 1), (1, 1)),
                                feature_group_count=dim,
                                name=f"s{si}_b{j}_local_dw", **p)(x)
                    y = _Bn(name=f"s{si}_b{j}_local_bn",
                            **p)(y, deterministic)
                    y = nn.Conv(dim, (1, 1), name=f"s{si}_b{j}_local_pw1",
                                **p)(y)
                    y = nn.gelu(y)
                    y = nn.Conv(dim, (1, 1), name=f"s{si}_b{j}_local_pw2",
                                **p)(y)
                    x = x + _LayerScale(dim, 1.0,
                                        name=f"s{si}_b{j}_local_ls",
                                        **p)(y)
                    a = _AdditiveAttention(dim, name=f"s{si}_b{j}_attn",
                                           **p)(x)
                    x = x + _LayerScale(dim, name=f"s{si}_b{j}_ls1",
                                        **p)(a)
                    m = _Bn(name=f"s{si}_b{j}_mlp_bn",
                            **p)(x, deterministic)
                    m = nn.Conv(int(dim * self.mlp_ratio), (1, 1),
                                name=f"s{si}_b{j}_mlp_fc1", **p)(m)
                    m = nn.gelu(m)
                    m = nn.Conv(dim, (1, 1), name=f"s{si}_b{j}_mlp_fc2",
                                **p)(m)
                    x = x + _LayerScale(dim, name=f"s{si}_b{j}_ls2",
                                        **p)(m)
                else:
                    x = _ConvEncoder(dim, int(dim * self.mlp_ratio),
                                     name=f"s{si}_b{j}",
                                     **p)(x, deterministic)

        x = _Bn(name="norm", **p)(x, deterministic)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        logits = nn.Dense(self.num_classes, name="head",
                          **p)(x).astype(jnp.float32)
        dist = nn.Dense(self.num_classes, name="head_dist",
                        **p)(x).astype(jnp.float32)
        return (logits + dist) / 2


def _swiftformer(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return SwiftFormer(**merged)

    return build


_VARIANTS = {
    "swiftformer_xs": dict(layers=(3, 3, 6, 4),
                           embed_dims=(48, 56, 112, 220)),
    "swiftformer_s": dict(layers=(3, 3, 9, 6),
                          embed_dims=(48, 64, 168, 224)),
    "swiftformer_l1": dict(layers=(4, 3, 10, 5),
                           embed_dims=(48, 96, 192, 384)),
    "swiftformer_l3": dict(layers=(4, 4, 12, 6),
                           embed_dims=(64, 128, 320, 512)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _swiftformer(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"SwiftFormer variant {_name!r} (reference "
                   f"swiftformer.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
