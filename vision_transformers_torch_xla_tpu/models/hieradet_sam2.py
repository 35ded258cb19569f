"""HieraDet (SAM2 image encoder) in Flax, NHWC.

Parity with the reference's dormant hieradet_sam2.py (662 LoC; SURVEY
§2.2): the SAM2 Hiera backbone — 7x7/s4 conv patch embed, a global
position embedding (broadcast with a per-window tile embed), four stages
of pre-norm transformer blocks whose attention is windowed per
`window_spec` except at the designated `global_att_blocks`, with
Q-pooling (2x2 max-pool on the query path + channel doubling) at each
stage transition.  Window partition/merge are pure reshapes; padding to
window multiples is static per trace.
"""
from __future__ import annotations

import sys
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    _layer_norm,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _win_part(x, w):
    b, h, ww, c = x.shape
    ph, pw = (-h) % w, (-ww) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, www = h + ph, ww + pw
    x = x.reshape(b, hh // w, w, www // w, w, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c),
            (hh, www))


def _win_merge(x, w, hw, out_hw):
    hh, ww = hw
    b = x.shape[0] // ((hh // w) * (ww // w))
    x = x.reshape(b, hh // w, ww // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)
    return x[:, :out_hw[0], :out_hw[1]]


class _MSA(nn.Module):
    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        d = self.dim_out
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = q.reshape(B, H, W, self.num_heads, hd)
            q = nn.max_pool(q.reshape(B, H, W, -1), (2, 2),
                            strides=(2, 2))
            Hq, Wq = q.shape[1], q.shape[2]
            q = q.reshape(B, Hq * Wq, self.num_heads, hd)
        else:
            Hq, Wq = H, W
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
        attn = jax.nn.softmax(logits.astype(jnp.float32),
                              axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        o = o.reshape(B, Hq, Wq, d)
        return nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(o)


class HieraDet(nn.Module):
    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (2, 3, 16, 3)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (12, 16, 20)
    global_pos_size: Tuple[int, int] = (7, 7)
    init_values: Optional[float] = None
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (7, 7), strides=4,
                    padding=((3, 3), (3, 3)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="patch_embed")(x)
        B, H, W, C = x.shape
        # global pos embed interpolated to the feature grid + a tiled
        # window embed (reference HieraDet._get_pos_embed)
        gp = self.param("pos_embed", nn.with_logical_partitioning(
            trunc_init, (None, None, None, "embed")),
            (1, *self.global_pos_size, self.embed_dim), self.param_dtype)
        pos = jax.image.resize(gp.astype(self.dtype), (1, H, W, C),
                               "bilinear")
        wtile = self.param("pos_embed_window",
                           nn.with_logical_partitioning(
                               trunc_init, (None, None, None, "embed")),
                           (1, self.window_spec[0], self.window_spec[0],
                            self.embed_dim), self.param_dtype)
        w0 = self.window_spec[0]
        reps = (-H) % w0
        tiled = jnp.tile(wtile.astype(self.dtype),
                         (1, (H + w0 - 1) // w0, (W + w0 - 1) // w0, 1))
        x = x + pos + tiled[:, :H, :W]

        total = sum(self.stages)
        dprs = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        dim = self.embed_dim
        heads = self.num_heads
        for si, depth in enumerate(self.stages):
            win = self.window_spec[si]
            for bj in range(depth):
                nm = f"s{si}_b{bj}"
                dpr = float(dprs[bi])
                q_pool = si > 0 and bj == 0
                dim_out = dim * 2 if q_pool else dim
                heads_out = heads * 2 if q_pool else heads
                is_global = bi in self.global_att_blocks
                shortcut = x
                y = _layer_norm(self.dtype, self.param_dtype,
                                f"{nm}_norm1")(x)
                if q_pool:
                    # stage transition: the reference pools the query path
                    # inside attention (k/v stay hi-res); here the map is
                    # max-pooled before attention — identical parameter
                    # shapes, static windowing at the pooled resolution
                    shortcut = nn.max_pool(
                        nn.Dense(dim_out, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"{nm}_proj")(y),
                        (2, 2), strides=(2, 2))
                    y = nn.max_pool(y, (2, 2), strides=(2, 2))
                out_hw = (y.shape[1], y.shape[2])
                if is_global or win >= max(y.shape[1], y.shape[2]):
                    y = _MSA(dim_out, heads_out, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"{nm}_attn")(y)
                else:
                    parts, hw = _win_part(y, win)
                    wb, n, _ = parts.shape
                    parts = parts.reshape(wb, win, win, dim)
                    parts = _MSA(dim_out, heads_out, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"{nm}_attn")(parts)
                    parts = parts.reshape(-1, win * win, dim_out)
                    y = _win_merge(parts, win, hw, out_hw)
                if self.init_values is not None:
                    g = self.param(f"{nm}_ls1", nn.initializers.constant(
                        self.init_values), (dim_out,), self.param_dtype)
                    y = y * g.astype(y.dtype)
                rng = None if det or dpr == 0 else \
                    self.make_rng("droppath")
                x = shortcut + drop_path(y, dpr, det, rng)
                y = _layer_norm(self.dtype, self.param_dtype,
                                f"{nm}_norm2")(x)
                hidm = int(dim_out * self.mlp_ratio)
                y = nn.Dense(hidm, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"{nm}_mlp1")(y)
                y = nn.gelu(y)
                y = nn.Dense(dim_out, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"{nm}_mlp2")(y)
                if self.init_values is not None:
                    g = self.param(f"{nm}_ls2", nn.initializers.constant(
                        self.init_values), (dim_out,), self.param_dtype)
                    y = y * g.astype(y.dtype)
                rng = None if det or dpr == 0 else \
                    self.make_rng("droppath")
                x = x + drop_path(y, dpr, det, rng)
                dim, heads = dim_out, heads_out
                bi += 1
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(
            x.mean(axis=(1, 2)))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _hieradet(**cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "remat",
                  "scan_blocks", "patch_size"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        if kw.get("init_values") is None:
            kw.pop("init_values", None)
        merged = dict(cfg)
        merged.update(kw)
        return HieraDet(**merged)

    return build


_V = {
    "sam2_hiera_tiny": _hieradet(stages=(1, 2, 7, 2),
                                 global_att_blocks=(5, 7, 9)),
    "sam2_hiera_small": _hieradet(stages=(1, 2, 11, 2),
                                  global_att_blocks=(7, 10, 13)),
    "sam2_hiera_base_plus": _hieradet(embed_dim=112, num_heads=2,
                                      global_pos_size=(14, 14)),
    "sam2_hiera_large": _hieradet(embed_dim=144, num_heads=2,
                                  stages=(2, 6, 36, 4),
                                  global_att_blocks=(23, 33, 43),
                                  window_spec=(8, 4, 16, 8)),
    "hieradet_small": _hieradet(stages=(1, 2, 11, 2),
                                global_att_blocks=(7, 10, 13),
                                window_spec=(8, 4, 16, 8),
                                init_values=1e-5),
}

_mod = sys.modules[__name__]
for _name, _fn in _V.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"HieraDet/SAM2 variant {_name!r} (reference "
                   f"hieradet_sam2.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
