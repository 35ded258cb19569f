"""Swin Transformer V2 in Flax, NHWC.

Parity with the reference's dormant swin_transformer_v2.py (1216 LoC) and
swin_transformer_v2_cr.py (1195 LoC) — SURVEY §2.2. V2 changes vs V1
(both modeled here):

* post-norm residuals: ``x + DropPath(LN(attn(x)))`` instead of pre-norm
* scaled-cosine attention: cosine(q, k) times a learned per-head
  logit scale clamped at log(100)
* log-spaced continuous relative position bias: a 2-layer MLP on
  log-spaced window coordinates replaces the learned bias table
* patch merging normalizes AFTER the reduction linear

The `swinv2_cr_*` names ride the same trunk (the CR reimplementation is
also cosine-attention + post-norm; its extra-norm-every-N-blocks "ns"
variants are modeled by a final stage norm only, noted per-entrypoint).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.swin import (
    _rel_pos_index,
    _shift_mask,
    _window_merge,
    _window_partition,
)

__all__ = []


def _log_coords_table(ws: int) -> np.ndarray:
    """Log-spaced CPB input coords, ((2ws-1)^2, 2) in [-1, 1]-ish.

    Reference swin_transformer_v2.py WindowAttention.__init__ (the
    relative_coords_table construction).
    """
    r = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)  # (2w-1,2w-1,2)
    table = table / max(ws - 1, 1) * 8.0
    table = np.sign(table) * np.log2(1.0 + np.abs(table)) / np.log2(8.0)
    return table.reshape(-1, 2)


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        bnw, n, c = x.shape
        h, ws = self.num_heads, self.window_size
        hd = c // h

        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x)
        # timm parity (reference swin_transformer_v2.py:117-121): bias-free
        # fused qkv + learnable q/v biases; k's bias is a zero buffer — NOT
        # redundant here because cosine attention normalizes k after it
        q_bias = self.param("q_bias",
                            nn.with_logical_partitioning(
                                nn.initializers.zeros_init(), ("qkv_out",)),
                            (c,), self.param_dtype)
        v_bias = self.param("v_bias",
                            nn.with_logical_partitioning(
                                nn.initializers.zeros_init(), ("qkv_out",)),
                            (c,), self.param_dtype)
        qkv = qkv + jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
        qkv = qkv.reshape(bnw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # scaled cosine attention (f32 accumulation)
        q = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-6)
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(float(np.log(10.0))),
            (h, 1, 1), self.param_dtype)
        scale = jnp.exp(jnp.minimum(logit_scale.astype(jnp.float32),
                                    float(np.log(100.0))))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * scale[None]

        # continuous relative position bias MLP on log-spaced coords
        table = jnp.asarray(_log_coords_table(ws), self.dtype)
        cpb = nn.Dense(512, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="cpb_fc1")(table)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="cpb_fc2")(cpb)
        idx = jnp.asarray(_rel_pos_index(ws))
        bias = cpb[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(bias.astype(jnp.float32))
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + \
                mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c).astype(x.dtype)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(out)


class SwinV2Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        b, hgt, wid, c = x.shape
        ws, shift = self.window_size, self.shift
        # post-norm residual #1: attention
        y = x
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(hgt, wid, ws, shift))
        else:
            mask = None
        y = _window_partition(y, ws)
        y = WindowAttentionV2(self.dim, self.num_heads, ws, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="attn")(y, mask)
        y = _window_merge(y, ws, hgt, wid)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)

        # post-norm residual #2: MLP
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class SwinTransformerV2(nn.Module):
    img_size: int = 256
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        hgt, wid = x.shape[1] // p, x.shape[2] // p
        x = x.astype(self.dtype).reshape(b, hgt, p, wid, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hgt, wid, p * p * 3)
        x = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("patch", "embed")),
                     name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for stage, (depth, heads) in enumerate(zip(self.depths,
                                                   self.num_heads)):
            dim = self.embed_dim * (2 ** stage)
            if stage > 0:
                # v2 patch merging: reduction linear THEN norm
                bh, hh, ww, cc = x.shape
                x = x.reshape(bh, hh // 2, 2, ww // 2, 2, cc)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    bh, hh // 2, ww // 2, 4 * cc)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             kernel_init=nn.with_logical_partitioning(
                                 trunc_init, ("patch", "embed")),
                             name=f"merge_proj_{stage}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"merge_norm_{stage}")(x)
            ws = min(self.window_size, x.shape[1])
            for blk in range(depth):
                shift = 0 if blk % 2 == 0 or ws >= x.shape[1] else ws // 2
                x = SwinV2Block(dim, heads, ws, shift, self.mlp_ratio,
                                float(dpr[cur + blk]), dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"stages_{stage}_blocks_{blk}")(
                    x, deterministic)
            cur += depth
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{stage}", x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _swinv2(preset, window, img, **kw):
    embed_dim, depths, heads = preset
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks"):
        kw.pop(k, None)
    kw.setdefault("img_size", img)
    kw.setdefault("window_size", window)
    kw.setdefault("embed_dim", embed_dim)
    kw.setdefault("depths", depths)
    kw.setdefault("num_heads", heads)
    return SwinTransformerV2(**kw)


# (embed_dim, depths, heads) size presets
_T = (96, (2, 2, 6, 2), (3, 6, 12, 24))
_S = (96, (2, 2, 18, 2), (3, 6, 12, 24))
_B = (128, (2, 2, 18, 2), (4, 8, 16, 32))
_L = (192, (2, 2, 18, 2), (6, 12, 24, 48))
_H = (352, (2, 2, 18, 2), (11, 22, 44, 88))   # cr huge
_G = (512, (2, 2, 42, 2), (16, 32, 64, 128))  # cr giant

# name -> (preset, window, img). Sizes mirror the reference entrypoints
# (swin_transformer_v2.py:~1050+, swin_transformer_v2_cr.py:~1000+).
_VARIANTS = {
    "swinv2_tiny_window8_256": (_T, 8, 256),
    "swinv2_tiny_window16_256": (_T, 16, 256),
    "swinv2_small_window8_256": (_S, 8, 256),
    "swinv2_small_window16_256": (_S, 16, 256),
    "swinv2_base_window8_256": (_B, 8, 256),
    "swinv2_base_window16_256": (_B, 16, 256),
    "swinv2_base_window12_192": (_B, 12, 192),
    "swinv2_base_window12to16_192to256": (_B, 16, 256),
    "swinv2_base_window12to24_192to384": (_B, 24, 384),
    "swinv2_large_window12_192": (_L, 12, 192),
    "swinv2_large_window12to16_192to256": (_L, 16, 256),
    "swinv2_large_window12to24_192to384": (_L, 24, 384),
    # CR reimplementation names (window = img // 32)
    "swinv2_cr_tiny_224": (_T, 7, 224),
    "swinv2_cr_tiny_384": (_T, 12, 384),
    "swinv2_cr_tiny_ns_224": (_T, 7, 224),
    "swinv2_cr_small_224": (_S, 7, 224),
    "swinv2_cr_small_384": (_S, 12, 384),
    "swinv2_cr_small_ns_224": (_S, 7, 224),
    "swinv2_cr_small_ns_256": (_S, 8, 256),
    "swinv2_cr_base_224": (_B, 7, 224),
    "swinv2_cr_base_384": (_B, 12, 384),
    "swinv2_cr_base_ns_224": (_B, 7, 224),
    "swinv2_cr_large_224": (_L, 7, 224),
    "swinv2_cr_large_384": (_L, 12, 384),
    "swinv2_cr_huge_224": (_H, 7, 224),
    "swinv2_cr_huge_384": (_H, 12, 384),
    "swinv2_cr_giant_224": (_G, 7, 224),
    "swinv2_cr_giant_384": (_G, 12, 384),
}


def _make(name, preset, window, img):
    def entrypoint(**kw):
        return _swinv2(preset, window, img, **kw)

    entrypoint.__name__ = name
    entrypoint.__qualname__ = name
    entrypoint.__doc__ = (f"SwinV2 variant {name!r} (reference "
                          f"swin_transformer_v2[_cr].py registry surface).")
    return entrypoint


import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, (_preset, _window, _img) in _VARIANTS.items():
    setattr(_mod, _name, register_model(_make(_name, _preset, _window, _img)))
