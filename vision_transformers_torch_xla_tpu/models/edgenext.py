"""EdgeNeXt in Flax, NHWC.

Parity with the reference's dormant edgenext.py (~650 LoC; SURVEY §2.2):
4 stages of ConvNeXt-style depthwise blocks (per-stage kernel sizes
3/5/7/9) whose last `global_block_counts[i]` blocks are
SplitTransposeBlocks — a Res2Net-style multi-scale depthwise split,
Fourier positional encoding (stage 1), cross-covariance (channel)
attention with a learned per-head temperature, and an inverted
bottleneck MLP, all with LayerScale (reference edgenext.py:108-222).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import Mlp
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _fourier_pos(h, w, hidden_dim=32, temperature=10000):
    """Static (H, W, 2·hidden) sine-cosine table (reference
    edgenext.py:31-65), computed in numpy at trace time."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32) / (h + eps) * scale)
    x = (np.arange(1, w + 1, dtype=np.float32) / (w + eps) * scale)
    dim_t = temperature ** (2 * (np.arange(hidden_dim) // 2) / hidden_dim)
    py = y[:, None] / dim_t                       # (H, hid)
    px = x[:, None] / dim_t
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])],
                  axis=2).reshape(h, -1)
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])],
                  axis=2).reshape(w, -1)
    pos = np.concatenate(
        [np.broadcast_to(py[:, None], (h, w, py.shape[-1])),
         np.broadcast_to(px[None, :], (h, w, px.shape[-1]))], axis=-1)
    return pos.astype(np.float32)                 # (H, W, 2*hid)


class _XCA(nn.Module):
    """Cross-covariance attention: C x C map over L2-normalized q/k with
    a learned per-head temperature (reference edgenext.py:108-146)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]           # (b, h, hd, n)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        temp = self.param("temperature", nn.initializers.ones, (h, 1, 1),
                          self.param_dtype)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * temp.astype(jnp.float32), axis=-1)
        o = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 3, 1, 2).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(o)


class EdgeNeXt(nn.Module):
    """Reference edgenext.py:300-430 (EdgeNeXt)."""

    num_classes: int = 1000
    dims: Sequence[int] = (24, 48, 88, 168)
    depths: Sequence[int] = (3, 3, 9, 3)
    global_block_counts: Sequence[int] = (0, 1, 1, 1)
    kernel_sizes: Sequence[int] = (3, 5, 7, 9)
    heads: Sequence[int] = (8, 8, 8, 8)
    d2_scales: Sequence[int] = (2, 2, 3, 4)
    use_pos_emb: Sequence[bool] = (False, True, False, False)
    ls_init_value: float = 1e-6
    expand_ratio: float = 4.0
    conv_bias: bool = True
    stem_type: str = "patch"
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _gamma(self, name, dim, x):
        if not self.ls_init_value:
            return x
        g = self.param(name, nn.initializers.constant(self.ls_init_value),
                       (dim,), self.param_dtype)
        return x * g.astype(x.dtype)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ln = dict(epsilon=1e-6, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.stem_type == "patch":
            x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                        padding="VALID", use_bias=self.conv_bias,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="stem")(x)
        else:
            x = nn.Conv(self.dims[0], (9, 9), strides=(4, 4),
                        padding=((4, 4), (4, 4)), use_bias=self.conv_bias,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="stem")(x)
        x = nn.LayerNorm(**ln, name="stem_norm")(x)

        for si in range(4):
            dim = self.dims[si]
            if si > 0:
                x = nn.LayerNorm(**ln, name=f"down_{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            use_bias=self.conv_bias, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"down_{si}")(x)
            n_global = self.global_block_counts[si]
            for j in range(self.depths[si]):
                if j < self.depths[si] - n_global:
                    # ConvNeXt-style block with per-stage kernel
                    ks = self.kernel_sizes[si]
                    y = nn.Conv(dim, (ks, ks),
                                padding=((ks // 2, ks // 2),) * 2,
                                feature_group_count=dim,
                                use_bias=self.conv_bias, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"s{si}_b{j}_dw")(x)
                    y = nn.LayerNorm(**ln, name=f"s{si}_b{j}_norm")(y)
                    y = Mlp(int(dim * self.expand_ratio), dim,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"s{si}_b{j}_mlp")(y, deterministic)
                    x = x + self._gamma(f"s{si}_b{j}_gamma", dim, y)
                else:
                    # SplitTransposeBlock
                    scales = max(1, self.d2_scales[si] - 1)
                    width = -(-dim // self.d2_scales[si])
                    shortcut = x
                    parts = [x[..., i * width:(i + 1) * width]
                             for i in range(self.d2_scales[si] - 1)]
                    parts.append(x[..., (self.d2_scales[si] - 1) * width:])
                    spo = []
                    sp = parts[0]
                    for ci in range(scales):
                        if ci > 0:
                            sp = sp + parts[ci]
                        w_ = sp.shape[-1]
                        sp = nn.Conv(w_, (3, 3), padding=((1, 1), (1, 1)),
                                     feature_group_count=w_,
                                     use_bias=self.conv_bias,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"s{si}_b{j}_conv{ci}")(sp)
                        spo.append(sp)
                    spo.append(parts[-1])
                    y = jnp.concatenate(spo, axis=-1)

                    b, hh, ww, c = y.shape
                    t = y.reshape(b, hh * ww, c)
                    if self.use_pos_emb[si]:
                        pos = jnp.asarray(_fourier_pos(hh, ww), self.dtype)
                        pos = nn.Dense(c, dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=f"s{si}_b{j}_pos_proj")(pos)
                        t = t + pos.reshape(1, hh * ww, c)
                    a = nn.LayerNorm(**ln, name=f"s{si}_b{j}_norm_xca")(t)
                    a = _XCA(c, self.heads[si], dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"s{si}_b{j}_xca")(a)
                    t = t + self._gamma(f"s{si}_b{j}_gamma_xca", c, a)
                    y = t.reshape(b, hh, ww, c)
                    y = nn.LayerNorm(**ln, name=f"s{si}_b{j}_norm")(y)
                    y = Mlp(int(c * self.expand_ratio), c,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"s{si}_b{j}_mlp")(y, deterministic)
                    x = shortcut + self._gamma(f"s{si}_b{j}_gamma", c, y)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(**ln, name="head_norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _edgenext(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return EdgeNeXt(**merged)

    return build


_VARIANTS = {
    "edgenext_xx_small": dict(depths=(2, 2, 6, 2), dims=(24, 48, 88, 168),
                              heads=(4, 4, 4, 4)),
    "edgenext_x_small": dict(depths=(3, 3, 9, 3), dims=(32, 64, 100, 192),
                             heads=(4, 4, 4, 4)),
    "edgenext_small": dict(depths=(3, 3, 9, 3), dims=(48, 96, 160, 304)),
    "edgenext_base": dict(depths=(3, 3, 9, 3), dims=(80, 160, 288, 584)),
    "edgenext_small_rw": dict(depths=(3, 3, 9, 3), dims=(48, 96, 192, 384),
                              conv_bias=False, stem_type="overlap"),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _edgenext(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"EdgeNeXt variant {_name!r} (reference edgenext.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
