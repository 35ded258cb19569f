"""BEiT: ViT with per-block relative position bias + shared-table option.

Parity with the reference's dormant beit.py (955 LoC): pre-norm blocks with
relative position bias added to attention logits, LayerScale (mandatory in
BEiT), mean pooling. The masked-image-modeling pretraining objective is out
of scope (the reference ships only the fine-tune architecture too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    LayerScale,
    Mlp,
    PatchEmbed,
    _dense,
    _layer_norm,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.ops.attention import masked_attention

__all__ = []


def _beit_rel_pos_index(grid: int) -> np.ndarray:
    """(1+G^2, 1+G^2) index into a table of (2G-1)^2 + 3 entries
    (3 extras: cls<->cls, cls->patch, patch->cls)."""
    num_rel = (2 * grid - 1) ** 2
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (grid - 1)
    idx = rel[..., 0] * (2 * grid - 1) + rel[..., 1]
    n = grid * grid
    out = np.zeros((n + 1, n + 1), np.int32)
    out[1:, 1:] = idx
    out[0, 0] = num_rel
    out[0, 1:] = num_rel + 1
    out[1:, 0] = num_rel + 2
    return out


class BeitAttention(nn.Module):
    dim: int
    num_heads: int
    grid: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = _dense(3 * c, ("embed", "qkv_out"), False, self.dtype,
                     self.param_dtype, "qkv")(x)
        # timm parity (reference beit.py:133-137): bias-free fused qkv plus
        # learnable q/v biases; the k bias is a constant-zero buffer
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
        qkv = qkv.reshape(b, s, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table = self.param(
            "rel_pos_bias_table",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         (None, "heads")),
            ((2 * self.grid - 1) ** 2 + 3, h), self.param_dtype)
        idx = jnp.asarray(_beit_rel_pos_index(self.grid))
        bias = table[idx.reshape(-1)].reshape(s, s, h).transpose(2, 0, 1)
        o = masked_attention(q, k, v, bias[None], scale=hd ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
        return _dense(c, ("qkv_out", "embed"), True, self.dtype,
                      self.param_dtype, "proj")(o)


class Beit(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    init_values: float = 0.1
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b = x.shape[0]
        grid = self.img_size // self.patch_size
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="patch_embed")(x)
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim)), x],
            axis=1)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            y = BeitAttention(self.embed_dim, self.num_heads, grid,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"blocks_{i}_attn")(
                _layer_norm(self.dtype, self.param_dtype, f"blocks_{i}_norm1")(x))
            y = LayerScale(self.embed_dim, self.init_values, self.param_dtype,
                           name=f"blocks_{i}_ls1")(y)
            rng = None if deterministic or dpr == 0 else self.make_rng("droppath")
            x = x + drop_path(y, dpr, deterministic, rng)
            y = Mlp(int(self.embed_dim * self.mlp_ratio), self.embed_dim,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"blocks_{i}_mlp")(
                _layer_norm(self.dtype, self.param_dtype, f"blocks_{i}_norm2")(x),
                deterministic)
            y = LayerScale(self.embed_dim, self.init_values, self.param_dtype,
                           name=f"blocks_{i}_ls2")(y)
            rng = None if deterministic or dpr == 0 else self.make_rng("droppath")
            x = x + drop_path(y, dpr, deterministic, rng)
        x = jnp.mean(x[:, 1:], axis=1)
        x = _layer_norm(self.dtype, self.param_dtype, "fc_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _beit(_dim, _depth, _heads, **kw):
    for k in ("pretrained_tag", "global_pool", "remat", "scan_blocks"):
        kw.pop(k, None)
    if kw.get("init_values") is None:
        kw.pop("init_values", None)
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("num_heads", _heads)
    return Beit(**kw)


@register_model
def beit_base_patch16_224(**kw):
    return _beit(768, 12, 12, **kw)


@register_model
def beit_large_patch16_224(**kw):
    return _beit(1024, 24, 16, **kw)


_MORE = {
    # reference beit.py: 384/512 fine-tune resolutions + BEiT-v2 (same
    # trunk, rel-pos bias, init_values 1e-5; weights differ)
    "beit_base_patch16_384": (768, 12, 12, 384),
    "beit_large_patch16_384": (1024, 24, 16, 384),
    "beit_large_patch16_512": (1024, 24, 16, 512),
    "beitv2_base_patch16_224": (768, 12, 12, 224),
    "beitv2_large_patch16_224": (1024, 24, 16, 224),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, (_d, _dep, _h, _res) in _MORE.items():
    def _build(_d=_d, _dep=_dep, _h=_h, _res=_res, **kw):
        kw.setdefault("img_size", _res)
        return _beit(_d, _dep, _h, **kw)
    _build.__name__ = _name
    _build.__qualname__ = _name
    _build.__doc__ = (f"BEiT variant {_name!r} (reference beit.py "
                      f"registry surface).")
    setattr(_mod, _name, register_model(_build))
