"""ConViT (soft convolutional inductive bias via gated positional
self-attention) in Flax.

Parity with the reference's dormant convit.py (432 LoC; SURVEY §2.2):
the first `local_up_to_layer` blocks use GPSA — attention that blends a
content score softmax(QKᵀ) with a position score softmax(W·rel), gated
per head by sigmoid(lambda); pos_proj is initialized so each head starts
as a convolutional kernel offset (reference convit.py:105-117
local_init), V starts as identity, and the cls token only joins the
sequence after the GPSA stage (reference convit.py:358-369).

TPU notes: rel_indices is a static (N, N, 3) table computed at trace
time (numpy) — no data-dependent shapes; the position score is one
(N, N, 3)x(3, H) matmul shared across the batch.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    PatchEmbed,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _rel_indices(num_patches: int) -> np.ndarray:
    """(1, N, N, 3) table of (dx, dy, d^2) patch offsets (reference
    convit.py:119-131)."""
    g = int(num_patches ** 0.5)
    ind = np.arange(g)[None, :] - np.arange(g)[:, None]      # (g, g)
    indx = np.tile(ind, (g, g))
    indy = np.repeat(np.repeat(ind, g, axis=0), g, axis=1)
    indd = indx ** 2 + indy ** 2
    return np.stack([indx, indy, indd], axis=-1)[None].astype(np.float32)


def _pos_proj_init(num_heads: int, locality_strength: float):
    """Each head starts attending to a fixed conv-kernel offset
    (reference convit.py:105-117 local_init)."""
    kernel_size = int(num_heads ** 0.5)
    center = (kernel_size - 1) / 2 if kernel_size % 2 == 0 else kernel_size // 2
    w = np.zeros((3, num_heads), dtype=np.float32)   # flax kernel (in, out)
    for h1 in range(kernel_size):
        for h2 in range(kernel_size):
            position = h1 + kernel_size * h2
            if position >= num_heads:
                continue
            w[2, position] = -1.0
            w[1, position] = 2 * (h1 - center)
            w[0, position] = 2 * (h2 - center)
    w *= locality_strength

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == w.shape, (shape, w.shape)
        return jnp.asarray(w, dtype)

    return init


class GPSA(nn.Module):
    dim: int
    num_heads: int
    locality_strength: float = 1.0
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qk = nn.Dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      kernel_init=nn.with_logical_partitioning(
                          trunc_init, ("embed", "qkv_out")),
                      name="qk")(x)
        qk = qk.reshape(b, n, 2, h, hd).transpose(2, 0, 3, 1, 4)
        q, k = qk[0], qk[1]
        patch_score = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                 preferred_element_type=jnp.float32)
        patch_score = jax.nn.softmax(patch_score * hd ** -0.5, axis=-1)

        rel = jnp.asarray(_rel_indices(n), self.dtype)        # (1, N, N, 3)
        pos_score = nn.Dense(
            h, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=_pos_proj_init(h, self.locality_strength),
            name="pos_proj")(rel)                             # (1, N, N, H)
        pos_score = jax.nn.softmax(
            pos_score.astype(jnp.float32).transpose(0, 3, 1, 2), axis=-1)

        gate = self.param("gating_param", nn.initializers.ones, (h,),
                          self.param_dtype)
        gate = jax.nn.sigmoid(gate.astype(jnp.float32)).reshape(1, h, 1, 1)
        attn = (1.0 - gate) * patch_score + gate * pos_score
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)

        # V initialized to identity: GPSA starts as a gated convolution
        # over raw features (reference convit.py:106)
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=lambda k_, s, d=jnp.float32: jnp.eye(
                         s[0], s[1], dtype=d),
                     name="v")(x)
        v = v.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(o)


class MHSA(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * hd ** -0.5, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(o)


class ConVit(nn.Module):
    """Reference convit.py:239-380 (ConVit)."""

    num_classes: int = 1000
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 48           # multiplied by num_heads (reference :269)
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    local_up_to_layer: int = 10
    locality_strength: float = 1.0
    qkv_bias: bool = False
    global_pool: str = "token"
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        dim = self.embed_dim * self.num_heads
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=dim,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="patch_embed")(x)
        n = x.shape[1]
        pos = self.param("pos_embed", trunc_init, (1, n, dim),
                         self.param_dtype)
        x = x + pos.astype(x.dtype)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim),
                         self.param_dtype)

        for i in range(self.depth):
            if i == self.local_up_to_layer:
                cls_tok = jnp.broadcast_to(
                    cls.astype(x.dtype), (x.shape[0], 1, dim))
                x = jnp.concatenate([cls_tok, x], axis=1)
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"blocks_{i}_norm1")(x)
            if i < self.local_up_to_layer:
                y = GPSA(dim, self.num_heads, self.locality_strength,
                         self.qkv_bias, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"blocks_{i}_attn")(y)
            else:
                y = MHSA(dim, self.num_heads, self.qkv_bias,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"blocks_{i}_attn")(y)
            rng = None if deterministic or dpr == 0 else \
                self.make_rng("droppath")
            x = x + drop_path(y, dpr, deterministic, rng)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"blocks_{i}_norm2")(x)
            y = Mlp(hidden_dim=int(dim * self.mlp_ratio), out_dim=dim,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"blocks_{i}_mlp")(y, deterministic)
            rng = None if deterministic or dpr == 0 else \
                self.make_rng("droppath")
            x = x + drop_path(y, dpr, deterministic, rng)

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.global_pool == "avg":
            x = jnp.mean(x[:, 1:], axis=1)
        else:
            x = x[:, 0]
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _convit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "init_values", "remat", "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return ConVit(**merged)

    return build


_VARIANTS = {
    "convit_tiny": dict(local_up_to_layer=10, locality_strength=1.0,
                        embed_dim=48, num_heads=4),
    "convit_small": dict(local_up_to_layer=10, locality_strength=1.0,
                         embed_dim=48, num_heads=9),
    "convit_base": dict(local_up_to_layer=10, locality_strength=1.0,
                        embed_dim=48, num_heads=16),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _convit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"ConViT variant {_name!r} (reference convit.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
