"""SAM ViT (Segment-Anything image encoder) in Flax, NHWC.

Parity with the reference's dormant vision_transformer_sam.py (762 LoC;
SURVEY §2.2): plain-ViT detection backbone — tokens kept on the 2D
grid, 14x14 windowed attention except at the global_attn_indexes,
decomposed per-axis relative position biases added to the attention map
(reference vision_transformer_sam.py:72-187), absolute 2D pos embed,
and a 1x1+3x3 LayerNorm2d neck to 256 channels before pooling.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import Mlp, trunc_init
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _SamAttention(nn.Module):
    """Attention over a (B, H, W, C) tile with decomposed rel-pos."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = self.num_heads
        hd = c // h
        n = hh * ww
        qkv = nn.Dense(3 * c, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x.reshape(b, n, c))
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * hd ** -0.5
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * hh - 1, hd), self.param_dtype)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * ww - 1, hd), self.param_dtype)
            ih = (np.arange(hh)[:, None] - np.arange(hh)[None, :]
                  + hh - 1).astype(np.int32)
            iw = (np.arange(ww)[:, None] - np.arange(ww)[None, :]
                  + ww - 1).astype(np.int32)
            Rh = rel_h[ih].astype(q.dtype)                # (hh, hh, hd)
            Rw = rel_w[iw].astype(q.dtype)                # (ww, ww, hd)
            rq = q.reshape(b, h, hh, ww, hd)
            bh = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
            bw = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
            bias = (bh[..., :, None] + bw[..., None, :]).reshape(
                b, h, n, n)
            s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        return nn.Dense(c, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(o)


class VisionTransformerSAM(nn.Module):
    """Reference vision_transformer_sam.py:319-600."""

    num_classes: int = 1000
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    neck_chans: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ln = dict(epsilon=1e-6, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        dim = self.embed_dim
        ps = self.patch_size
        b, ih, iw, c = x.shape
        x = x.astype(self.dtype)
        x = nn.Conv(dim, (ps, ps), strides=(ps, ps), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="patch_embed")(x)           # (B, gh, gw, dim)
        gh, gw = x.shape[1], x.shape[2]
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, gh, gw, dim), self.param_dtype)
        x = x + pos.astype(x.dtype)

        ws = self.window_size
        for i in range(self.depth):
            is_global = i in self.global_attn_indexes or ws == 0
            shortcut = x
            y = nn.LayerNorm(**ln, name=f"blocks_{i}_norm1")(x)
            if not is_global:
                ph = (-gh) % ws
                pw = (-gw) % ws
                if ph or pw:
                    y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
                hp, wp = gh + ph, gw + pw
                nh, nw = hp // ws, wp // ws
                y = y.reshape(b, nh, ws, nw, ws, dim).transpose(
                    0, 1, 3, 2, 4, 5).reshape(b * nh * nw, ws, ws, dim)
                y = _SamAttention(dim, self.num_heads, self.use_rel_pos,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"blocks_{i}_attn")(y)
                y = y.reshape(b, nh, nw, ws, ws, dim).transpose(
                    0, 1, 3, 2, 4, 5).reshape(b, hp, wp, dim)
                if ph or pw:
                    y = y[:, :gh, :gw]
            else:
                y = _SamAttention(dim, self.num_heads, self.use_rel_pos,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"blocks_{i}_attn")(y)
            x = shortcut + y
            y = nn.LayerNorm(**ln, name=f"blocks_{i}_norm2")(x)
            y = Mlp(int(dim * self.mlp_ratio), dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{i}_mlp")(y, deterministic)
            x = x + y

        # neck: 1x1 -> LN2d -> 3x3 -> LN2d (reference :560-580)
        x = nn.Conv(self.neck_chans, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="neck_conv1")(x)
        x = nn.LayerNorm(**ln, name="neck_norm1")(x)
        x = nn.Conv(self.neck_chans, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(**ln, name="neck_norm2")(x)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _samvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return VisionTransformerSAM(**merged)

    return build


_VARIANTS = {
    "samvit_base_patch16": dict(embed_dim=768, depth=12, num_heads=12,
                                global_attn_indexes=(2, 5, 8, 11),
                                img_size=1024),
    "samvit_large_patch16": dict(embed_dim=1024, depth=24, num_heads=16,
                                 global_attn_indexes=(5, 11, 17, 23),
                                 img_size=1024),
    "samvit_huge_patch16": dict(embed_dim=1280, depth=32, num_heads=16,
                                global_attn_indexes=(7, 15, 23, 31),
                                img_size=1024),
    "samvit_base_patch16_224": dict(embed_dim=768, depth=12,
                                    num_heads=12,
                                    global_attn_indexes=(2, 5, 8, 11),
                                    img_size=224, window_size=14),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _samvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"SAM ViT variant {_name!r} (reference "
                   f"vision_transformer_sam.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
