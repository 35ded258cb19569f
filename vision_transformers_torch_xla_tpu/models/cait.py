"""CaiT: Class-Attention in Image Transformers.

Parity with the reference's dormant cait.py (594 LoC): talking-heads
self-attention layers over patch tokens only (with LayerScale, mandatory),
followed by class-attention layers where a cls token attends over the
frozen patch tokens.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
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
from vision_transformers_torch_xla_tpu.ops.attention import multi_head_attention

__all__ = []


class TalkingHeadAttention(nn.Module):
    """Talking-heads self-attention (Shazeer et al., arXiv:2003.02436).

    Learned head-mixing projections straddle the softmax: proj_l mixes the
    raw scores across heads, proj_w mixes the probabilities. Parity:
    reference models/cait.py:117-157 (TalkingHeadAttn). The torch code
    permutes the (B, H, S, S) score tensor head-last, applies a Linear(H, H)
    and permutes back; here both mixes are single einsum contractions over
    the head axis — XLA folds the implied transposes into the dot's
    input/output layouts, so no (B, H, S, S) copy is materialized.
    """

    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h

        def head_mix(name):
            w = self.param(f"{name}_kernel",
                           nn.with_logical_partitioning(trunc_init,
                                                        (None, None)),
                           (h, h), self.param_dtype)
            bia = self.param(f"{name}_bias",
                             nn.with_logical_partitioning(
                                 nn.initializers.zeros_init(), (None,)),
                             (h,), self.param_dtype)
            return lambda t: (jnp.einsum("bhqk,hg->bgqk", t,
                                         w.astype(t.dtype))
                              + bia.astype(t.dtype)[None, :, None, None])

        qkv = _dense(3 * d, ("embed", "qkv_out"), self.qkv_bias,
                     self.dtype, self.param_dtype, "qkv")(x)
        qkv = qkv.reshape(b, s, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        scores = head_mix("proj_l")(scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = head_mix("proj_w")(probs)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return _dense(d, ("qkv_out", "embed"), True, self.dtype,
                      self.param_dtype, "proj")(o)


class TalkingHeadBlock(nn.Module):
    """Pre-norm block with talking-heads attention + mandatory LayerScale.

    Parity: reference models/cait.py:160-215 (LayerScaleBlock with
    attn_block=TalkingHeadAttn).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        rate = self.drop_path_rate
        attn_out = TalkingHeadAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn",
        )(_layer_norm(self.dtype, self.param_dtype, "norm1")(x),
          deterministic)
        attn_out = LayerScale(d, self.init_values, self.param_dtype,
                              name="ls1")(attn_out)
        rng = None if deterministic or rate == 0.0 \
            else self.make_rng("droppath")
        x = x + drop_path(attn_out, rate, deterministic, rng)

        mlp_out = Mlp(int(d * self.mlp_ratio), d, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="mlp")(
            _layer_norm(self.dtype, self.param_dtype, "norm2")(x),
            deterministic)
        mlp_out = LayerScale(d, self.init_values, self.param_dtype,
                             name="ls2")(mlp_out)
        rng = None if deterministic or rate == 0.0 \
            else self.make_rng("droppath")
        return x + drop_path(mlp_out, rate, deterministic, rng)


class ClassAttentionBlock(nn.Module):
    """cls token cross-attends over [cls; patches]; only cls updates."""

    num_heads: int
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_cls: jax.Array, x_patches: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        d = x_cls.shape[-1]
        h = self.num_heads
        hd = d // h
        b = x_cls.shape[0]
        u = jnp.concatenate([x_cls, x_patches], axis=1)
        u = _layer_norm(self.dtype, self.param_dtype, "norm1")(u)
        q = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "q")(u[:, :1])
        k = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "k")(u)
        v = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "v")(u)
        s = u.shape[1]
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v, scale=hd ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        o = _dense(d, ("qkv_out", "embed"), True, self.dtype,
                   self.param_dtype, "proj")(o)
        gamma1 = self.param("gamma1",
                            nn.with_logical_partitioning(
                                nn.initializers.constant(self.init_values),
                                ("embed",)), (d,), self.param_dtype)
        x_cls = x_cls + o * gamma1.astype(o.dtype)

        y = _layer_norm(self.dtype, self.param_dtype, "norm2")(x_cls)
        y = Mlp(int(d * self.mlp_ratio), d, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(y, deterministic)
        gamma2 = self.param("gamma2",
                            nn.with_logical_partitioning(
                                nn.initializers.constant(self.init_values),
                                ("embed",)), (d,), self.param_dtype)
        return x_cls + y * gamma2.astype(y.dtype)


class Cait(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 192
    depth: int = 24
    depth_token_only: int = 2
    num_heads: int = 4
    mlp_ratio: float = 4.0
    init_values: float = 1e-5
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b = x.shape[0]
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="patch_embed")(x)
        n = x.shape[1]
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
                         (1, n, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = TalkingHeadBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                init_values=self.init_values, drop_path_rate=dpr,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"blocks_{i}")(x, deterministic)
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        x_cls = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim))
        for i in range(self.depth_token_only):
            x_cls = ClassAttentionBlock(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                init_values=self.init_values, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_token_only_{i}")(x_cls, x, deterministic)
        x_cls = _layer_norm(self.dtype, self.param_dtype, "norm")(x_cls)[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x_cls).astype(jnp.float32)


def _cait(_dim, _depth, _heads, **kw):
    for k in ("pretrained_tag", "global_pool", "remat", "scan_blocks"):
        kw.pop(k, None)
    kw.setdefault("init_values", 1e-5)
    if kw["init_values"] is None:
        kw["init_values"] = 1e-5
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("num_heads", _heads)
    return Cait(**kw)


@register_model
def cait_xxs24_224(**kw):
    return _cait(192, 24, 4, **kw)


@register_model
def cait_xs24_224(**kw):
    return _cait(288, 24, 6, **kw)


@register_model
def cait_s24_224(**kw):
    return _cait(384, 24, 8, **kw)


_MORE = {
    # reference cait.py registrations (full size/resolution grid)
    "cait_xxs24_384": (192, 24, 4, 384, 1e-5),
    "cait_xxs36_224": (192, 36, 4, 224, 1e-5),
    "cait_xxs36_384": (192, 36, 4, 384, 1e-5),
    "cait_xs24_384": (288, 24, 6, 384, 1e-5),
    "cait_s24_384": (384, 24, 8, 384, 1e-5),
    "cait_s36_384": (384, 36, 8, 384, 1e-6),
    "cait_m36_384": (768, 36, 16, 384, 1e-6),
    "cait_m48_448": (768, 48, 16, 448, 1e-6),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, (_d, _dep, _h, _res, _iv) in _MORE.items():
    def _build(_d=_d, _dep=_dep, _h=_h, _res=_res, _iv=_iv, **kw):
        kw.setdefault("img_size", _res)
        kw.setdefault("init_values", _iv)
        return _cait(_d, _dep, _h, **kw)
    _build.__name__ = _name
    _build.__qualname__ = _name
    _build.__doc__ = (f"CaiT variant {_name!r} (reference cait.py "
                      f"registry surface).")
    setattr(_mod, _name, register_model(_build))
