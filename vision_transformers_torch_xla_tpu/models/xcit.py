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

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
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


class XCiTClassAttentionBlock(nn.Module):
    """XCiT's class-attention block over the FULL [cls; patches] sequence.

    Exact parity with reference xcit.py:144-194 — distinct from CaiT's:
    the attention residual adds gamma1 * [attn(cls); norm1(x)[patches]] to
    every token (patch tokens accumulate their normed selves); norm2 runs
    over all tokens when tokens_norm else the cls token only; and the MLP
    residual re-adds the raw patch tokens (the documented timm quirk from
    PR #747 — patch tokens double each layer), so converted checkpoints
    reproduce the reference numerics token-for-token.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1.0
    tokens_norm: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        from vision_transformers_torch_xla_tpu.ops.attention import (
            multi_head_attention,
        )

        b, s, d = x.shape
        h = self.num_heads
        hd = d // h

        def gamma(name):
            return self.param(name, nn.with_logical_partitioning(
                nn.initializers.constant(self.init_values), ("embed",)),
                (d,), self.param_dtype)

        xn = _layer_norm(self.dtype, self.param_dtype, "norm1")(x)
        q = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "q")(xn[:, :1])
        k = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "k")(xn)
        v = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "v")(xn)
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v, scale=hd ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        attn_cls = _dense(d, ("qkv_out", "embed"), True, self.dtype,
                          self.param_dtype, "proj")(o)
        x_attn = jnp.concatenate([attn_cls, xn[:, 1:]], axis=1)
        x = x + x_attn * gamma("gamma1").astype(x_attn.dtype)
        if self.tokens_norm:
            x = _layer_norm(self.dtype, self.param_dtype, "norm2")(x)
        else:
            x = jnp.concatenate(
                [_layer_norm(self.dtype, self.param_dtype, "norm2")(x[:, :1]),
                 x[:, 1:]], axis=1)
        x_res = x
        cls = Mlp(int(d * self.mlp_ratio), d, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="mlp")(
            x[:, :1], deterministic)
        cls = cls * gamma("gamma2").astype(cls.dtype)
        return x_res + jnp.concatenate([cls, x[:, 1:]], axis=1)


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
    tokens_norm: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b = x.shape[0]
        g = x.shape[1] // self.patch_size
        # conv patch stem (reference xcit.py:76-106 ConvPatchEmbed):
        # stacked conv3x3(s2)+BN with GELU between; 4 convs for p16,
        # 3 for p8
        d = self.embed_dim
        plan = ((d // 8, d // 4, d // 2, d) if self.patch_size == 16
                else (d // 4, d // 2, d))
        x = x.astype(self.dtype)
        for i, ch in enumerate(plan):
            x = nn.Conv(ch, (3, 3), strides=2, padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"patch_embed_conv{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"patch_embed_bn{i}")(x)
            if i < len(plan) - 1:
                x = nn.gelu(x)
        x = x.reshape(b, g * g, d)
        # Fourier positional encoding (reference xcit.py:40-73): fixed
        # sin/cos features of the 2-D grid, projected to embed_dim by a
        # learned 1x1 conv (hidden 32 per axis -> 64 channels)
        hidden = 32
        yy, xx = jnp.meshgrid(jnp.arange(g), jnp.arange(g), indexing="ij")
        coords = jnp.stack([yy, xx], axis=-1).astype(jnp.float32) + 1.0
        coords = coords / (coords[-1:, -1:, :] + 1e-6) * (2 * jnp.pi)
        dim_t = 10000.0 ** (2 * (jnp.arange(hidden) // 2) / hidden)
        feats = coords[:, :, :, None] / dim_t
        # interleave [sin(f0), cos(f1), sin(f2), ...] exactly like the
        # reference's stack(..., dim=4).flatten(3) (xcit.py:58-61) so the
        # learned projection converts weight-for-weight
        feats = jnp.stack([jnp.sin(feats[..., 0::2]),
                           jnp.cos(feats[..., 1::2])],
                          axis=-1).reshape(g, g, -1)
        pos = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="pos_proj")(feats.astype(self.dtype))
        x = x + pos.reshape(1, g * g, d)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = XCiTLayer(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.init_values, dpr, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"blocks_{i}")(x, (g, g), deterministic)
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim)),
             x], axis=1)
        for i in range(self.cls_attn_layers):
            x = XCiTClassAttentionBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                init_values=self.init_values, tokens_norm=self.tokens_norm,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"cls_attn_blocks_{i}")(x, deterministic)
        x_cls = _layer_norm(self.dtype, self.param_dtype, "norm")(x)[:, 0]
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


_SIZES = {
    # name part -> (embed_dim, num_heads); depths/eta per reference
    # xcit.py registrations (nano/tiny/small 12-layer use eta=1.0,
    # everything deeper/larger uses 1e-5)
    "nano": (128, 4),
    "tiny": (192, 4),
    "small": (384, 8),
    "medium": (512, 8),
    "large": (768, 16),
}
_GRID = [(s, d) for s in ("nano", "tiny", "small") for d in (12, 24)
         if not (s == "nano" and d == 24)] + [("medium", 24), ("large", 24)]

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _size, _depth in _GRID:
    for _ps in (16, 8):
        for _res in (224, 384):
            _dim, _heads = _SIZES[_size]
            _eta = 1.0 if _depth == 12 and _size in ("nano", "tiny",
                                                     "small") else 1e-5
            _name = f"xcit_{_size}_{_depth}_p{_ps}_{_res}"

            def _build(_dim=_dim, _depth=_depth, _heads=_heads, _ps=_ps,
                       _res=_res, _eta=_eta, _size=_size, **kw):
                kw.setdefault("patch_size", _ps)
                kw.setdefault("img_size", _res)
                kw.setdefault("init_values", _eta)
                # reference xcit.py:753-972: tokens_norm=False for nano only
                kw.setdefault("tokens_norm", _size != "nano")
                return _xcit(_dim, _depth, _heads, **kw)

            _build.__name__ = _name
            _build.__qualname__ = _name
            _build.__doc__ = (f"XCiT variant {_name!r} (reference xcit.py "
                              f"registry surface).")
            setattr(_mod, _name, register_model(_build))
