"""XCiT: Cross-Covariance Image Transformer.

Parity with the reference's dormant xcit.py (1009 LoC): XCA blocks where
attention acts on the CHANNEL dimension (d x d cross-covariance of
L2-normalized features — linear in token count), a Local Patch Interaction
(LPI) depthwise-conv block between XCA and MLP, and class-attention layers
at the end (reused from CaiT).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.cait import ClassAttentionBlock
from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    PatchEmbed,
    _dense,
    _layer_norm,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class XCA(nn.Module):
    """Cross-covariance attention: softmax over a (head_dim x head_dim)
    channel-covariance with a learned temperature."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = _dense(3 * c, ("embed", "qkv_out"), True, self.dtype,
                     self.param_dtype, "qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 4, 1)  # (3,B,H,hd,N)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                 keepdims=True) + 1e-6)
        temp = self.param("temperature",
                          nn.with_logical_partitioning(
                              nn.initializers.ones_init(), ("heads",)),
                          (h, 1, 1), self.param_dtype)
        attn = jnp.einsum("bhdn,bhen->bhde", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * temp.astype(jnp.float32), axis=-1)
        o = jnp.einsum("bhde,bhen->bhdn", attn.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        o = o.transpose(0, 3, 1, 2).reshape(b, n, c).astype(x.dtype)
        return _dense(c, ("qkv_out", "embed"), True, self.dtype,
                      self.param_dtype, "proj")(o)


class LPI(nn.Module):
    """Local Patch Interaction: two 3x3 depthwise convs over the token grid."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple,
                 deterministic: bool = True) -> jax.Array:
        b, n, c = x.shape
        grid = x.reshape(b, hw[0], hw[1], c)
        grid = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv1")(grid)
        grid = nn.gelu(grid, approximate=True)
        grid = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(grid)
        grid = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv2")(grid)
        return grid.reshape(b, n, c)


class XCiTLayer(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple,
                 deterministic: bool = True) -> jax.Array:
        def ls(name):
            return self.param(name, nn.with_logical_partitioning(
                nn.initializers.constant(self.init_values), ("embed",)),
                (self.dim,), self.param_dtype)

        rngf = lambda: (None if deterministic or self.drop_path_rate == 0
                        else self.make_rng("droppath"))
        y = XCA(self.dim, self.num_heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name="attn")(
            _layer_norm(self.dtype, self.param_dtype, "norm1")(x))
        x = x + drop_path(y * ls("gamma1").astype(y.dtype),
                          self.drop_path_rate, deterministic, rngf())
        y = LPI(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name="local_mp")(
            _layer_norm(self.dtype, self.param_dtype, "norm3")(x), hw,
            deterministic)
        x = x + drop_path(y * ls("gamma3").astype(y.dtype),
                          self.drop_path_rate, deterministic, rngf())
        y = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(
            _layer_norm(self.dtype, self.param_dtype, "norm2")(x),
            deterministic)
        x = x + drop_path(y * ls("gamma2").astype(y.dtype),
                          self.drop_path_rate, deterministic, rngf())
        return x


class XCiT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 12
    cls_attn_layers: int = 2
    num_heads: int = 8
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b = x.shape[0]
        g = self.img_size // self.patch_size
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="patch_embed")(x)
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
                         (1, g * g, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = XCiTLayer(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.init_values, dpr, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"blocks_{i}")(x, (g, g), deterministic)
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        x_cls = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim))
        for i in range(self.cls_attn_layers):
            x_cls = ClassAttentionBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                init_values=self.init_values, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"cls_attn_blocks_{i}")(x_cls, x, deterministic)
        x_cls = _layer_norm(self.dtype, self.param_dtype, "norm")(x_cls)[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x_cls).astype(jnp.float32)


def _xcit(_dim, _depth, _heads, **kw):
    for k in ("pretrained_tag", "global_pool", "remat", "scan_blocks"):
        kw.pop(k, None)
    if kw.get("init_values") is None:
        kw.pop("init_values", None)
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("num_heads", _heads)
    return XCiT(**kw)


@register_model
def xcit_nano_12_p16_224(**kw):
    return _xcit(128, 12, 4, **kw)


@register_model
def xcit_tiny_12_p16_224(**kw):
    return _xcit(192, 12, 4, **kw)


@register_model
def xcit_small_12_p16_224(**kw):
    return _xcit(384, 12, 8, **kw)
