"""CrossViT (dual-branch multi-scale ViT with cross-attention fusion)
in Flax.

Parity with the reference's dormant crossvit.py (~620 LoC; SURVEY §2.2):
two branches see the image at different scales (bicubic resize per
branch) and patch sizes (12 / 16); each MultiScaleBlock runs a per-branch
ViT block stack, then fuses by projecting each branch's cls token into
the other branch's width, cross-attending it (q = cls, k/v = other
branch's patch tokens, reference crossvit.py:82-152), and projecting it
back. Heads are averaged across branches. Dagger variants use a
multi-conv stem.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Block,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class CrossAttention(nn.Module):
    """q from the cls token only; k/v over the full sequence
    (reference crossvit.py:82-121)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                trunc_init, ("embed", "qkv_out")), name=name)
        q = dense("wq")(x[:, 0:1]).reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = dense("wk")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = dense("wv")(x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * hd ** -0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="proj")(o)


class CrossVit(nn.Module):
    """Reference crossvit.py:290-430 (CrossVit)."""

    num_classes: int = 1000
    img_size: int = 240
    img_scale: Sequence[float] = (1.0, 1.0)
    patch_size: Sequence[int] = (12, 16)
    embed_dim: Sequence[int] = (96, 192)
    depths: Sequence[Sequence[int]] = ((1, 4, 0), (1, 4, 0), (1, 4, 0))
    num_heads: Sequence[int] = (3, 3)
    mlp_ratio: Sequence[float] = (4.0, 4.0, 1.0)
    multi_conv: bool = False
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _embed(self, x, branch, size, p, dim):
        """Per-branch resize + patch embed (+ multi-conv dagger stem)."""
        b = x.shape[0]
        if x.shape[1] != size:
            x = jax.image.resize(x, (b, size, size, x.shape[-1]),
                                 method="bicubic")
        x = x.astype(self.dtype)
        conv = lambda feat, k, s, pad, name: nn.Conv(  # noqa: E731
            feat, (k, k), strides=(s, s), padding=pad, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        if self.multi_conv:
            x = nn.relu(conv(dim // 4, 7, 4, ((3, 3), (3, 3)),
                             f"patch_{branch}_c0")(x))
            if p == 12:
                x = nn.relu(conv(dim // 2, 3, 3, "VALID",
                                 f"patch_{branch}_c1")(x))
                x = conv(dim, 3, 1, ((1, 1), (1, 1)), f"patch_{branch}_c2")(x)
            else:
                x = nn.relu(conv(dim // 2, 3, 2, ((1, 1), (1, 1)),
                                 f"patch_{branch}_c1")(x))
                x = conv(dim, 3, 2, ((1, 1), (1, 1)), f"patch_{branch}_c2")(x)
        else:
            x = conv(dim, p, p, "VALID", f"patch_{branch}")(x)
        return x.reshape(b, -1, dim)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        nb = len(self.patch_size)
        sizes = [int(self.img_size * s) for s in self.img_scale]
        xs = []
        for i in range(nb):
            dim = self.embed_dim[i]
            t = self._embed(x, i, sizes[i], self.patch_size[i], dim)
            cls = self.param(f"cls_token_{i}", trunc_init, (1, 1, dim),
                             self.param_dtype)
            cls = jnp.broadcast_to(cls.astype(t.dtype), (t.shape[0], 1, dim))
            t = jnp.concatenate([cls, t], axis=1)
            pos = self.param(f"pos_embed_{i}", trunc_init,
                             (1, t.shape[1], dim), self.param_dtype)
            xs.append(t + pos.astype(t.dtype))

        for bi, block_cfg in enumerate(self.depths):
            # per-branch block stacks
            outs = []
            for d in range(nb):
                t = xs[d]
                for j in range(block_cfg[d]):
                    t = Block(num_heads=self.num_heads[d],
                              mlp_ratio=self.mlp_ratio[d],
                              drop_path_rate=self.drop_path_rate,
                              dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name=f"blocks_{bi}_{d}_{j}")(t, deterministic)
                outs.append(t)
            # cross fusion (reference crossvit.py:244-262)
            fused = []
            for d in range(nb):
                d_ = (d + 1) % nb
                dim_d, dim_o = self.embed_dim[d], self.embed_dim[d_]
                cls = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"projs_{bi}_{d}_norm")(
                    outs[d][:, 0:1])
                cls = nn.Dense(dim_o, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"projs_{bi}_{d}_fc")(nn.gelu(cls))
                t = jnp.concatenate([cls, outs[d_][:, 1:]], axis=1)
                y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"fusion_{bi}_{d}_norm")(t)
                cls = cls + CrossAttention(
                    dim_o, self.num_heads[d_], dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"fusion_{bi}_{d}_attn")(y)
                cls = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=f"revert_projs_{bi}_{d}_norm")(cls)
                cls = nn.Dense(dim_d, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"revert_projs_{bi}_{d}_fc")(
                    nn.gelu(cls))
                fused.append(jnp.concatenate([cls, outs[d][:, 1:]], axis=1))
            xs = fused

        logits = []
        for d in range(nb):
            t = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"norm_{d}")(xs[d])
            if self.num_classes == 0:
                logits.append(t[:, 0])
            else:
                logits.append(nn.Dense(
                    self.num_classes, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"head_{d}")(t[:, 0]).astype(jnp.float32))
        if self.num_classes == 0:
            return jnp.concatenate(logits, axis=-1)
        return sum(logits) / nb


def _crossvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return CrossVit(**merged)

    return build


_S240 = dict(img_scale=(1.0, 224 / 240))
_VARIANTS = {
    "crossvit_tiny_240": dict(embed_dim=(96, 192), num_heads=(3, 3),
                              depths=((1, 4, 0),) * 3,
                              mlp_ratio=(4, 4, 1), **_S240),
    "crossvit_small_240": dict(embed_dim=(192, 384), num_heads=(6, 6),
                               depths=((1, 4, 0),) * 3,
                               mlp_ratio=(4, 4, 1), **_S240),
    "crossvit_base_240": dict(embed_dim=(384, 768), num_heads=(12, 12),
                              depths=((1, 4, 0),) * 3,
                              mlp_ratio=(4, 4, 1), **_S240),
    "crossvit_9_240": dict(embed_dim=(128, 256), num_heads=(4, 4),
                           depths=((1, 3, 0),) * 3,
                           mlp_ratio=(3, 3, 1), **_S240),
    "crossvit_15_240": dict(embed_dim=(192, 384), num_heads=(6, 6),
                            depths=((1, 5, 0),) * 3,
                            mlp_ratio=(3, 3, 1), **_S240),
    "crossvit_18_240": dict(embed_dim=(224, 448), num_heads=(7, 7),
                            depths=((1, 6, 0),) * 3,
                            mlp_ratio=(3, 3, 1), **_S240),
    "crossvit_9_dagger_240": dict(embed_dim=(128, 256), num_heads=(4, 4),
                                  depths=((1, 3, 0),) * 3,
                                  mlp_ratio=(3, 3, 1), multi_conv=True,
                                  **_S240),
    "crossvit_15_dagger_240": dict(embed_dim=(192, 384), num_heads=(6, 6),
                                   depths=((1, 5, 0),) * 3,
                                   mlp_ratio=(3, 3, 1), multi_conv=True,
                                   **_S240),
    "crossvit_15_dagger_408": dict(embed_dim=(192, 384), num_heads=(6, 6),
                                   depths=((1, 5, 0),) * 3,
                                   mlp_ratio=(3, 3, 1), multi_conv=True,
                                   img_size=408,
                                   img_scale=(1.0, 384 / 408)),
    "crossvit_18_dagger_240": dict(embed_dim=(224, 448), num_heads=(7, 7),
                                   depths=((1, 6, 0),) * 3,
                                   mlp_ratio=(3, 3, 1), multi_conv=True,
                                   **_S240),
    "crossvit_18_dagger_408": dict(embed_dim=(224, 448), num_heads=(7, 7),
                                   depths=((1, 6, 0),) * 3,
                                   mlp_ratio=(3, 3, 1), multi_conv=True,
                                   img_size=408,
                                   img_scale=(1.0, 384 / 408)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _crossvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"CrossViT variant {_name!r} (reference crossvit.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
