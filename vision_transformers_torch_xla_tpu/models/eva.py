"""EVA / EVA-02 vision transformers in Flax, NHWC.

Parity with the reference's dormant eva.py (1807 LoC; SURVEY §2.2):
a ViT trunk extended with

* 2-D axial rotary position embeddings on q/k (grid tokens only;
  cls/register tokens are left unrotated)
* SwiGLU MLP with an optional inner LayerNorm (``scale_mlp``) — EVA-02
* learned absolute pos-embed (optional, on top of rope)
* the reference's `vit_*_rope_*_gap` names (rope + register tokens +
  global average pooling) ride the same trunk.

Numerics: exact parity with the reference — rope reproduces
RotaryEmbeddingCat(in_pixels=False) incl. per-variant ref_feat_shape
rescaling, grid_offset, and 'xy' indexing (reference eva.py:544-551 and
the per-model registrations); norm/pool layout follows the reference's
fc_norm/post-norm resolution (:500-508); tiny/small use the fused GluMlp
without inner norm; eva02 enormous uses residual post-norm blocks
(:391-396). Norm eps is fixed at 1e-6 like our ViT.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def rope_2d_tables(head_dim: int, gh: int, gw: int,
                   theta: float = 10000.0,
                   ref_feat_shape: Optional[Tuple[int, int]] = None,
                   grid_offset: float = 0.0,
                   grid_indexing: str = "ij") -> Tuple[np.ndarray, np.ndarray]:
    """Axial 2-D rope tables, each (gh*gw, head_dim//2).

    Exact parity with the reference's RotaryEmbeddingCat(in_pixels=False)
    construction (reference eva.py:544-551): integer grid coords plus
    grid_offset, rescaled by ref_feat_shape/feat_shape when a reference
    grid is given (this is how 336/448 fine-tunes reuse the 224-trained
    frequencies), frequency bands theta**(-i/(d/4)), pair-interleaved
    rotation (timm's repeat_interleave(2) + rot-half-pairs form is the
    same rotation as the (even, odd) pairing used here). grid_indexing
    'ij' puts the row-coordinate bands first; 'xy' (the Perception
    Encoder layout) puts the column-coordinate bands first.
    """
    d4 = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(d4, dtype=np.float64) / d4))
    cy = np.arange(gh, dtype=np.float64) + grid_offset
    cx = np.arange(gw, dtype=np.float64) + grid_offset
    if ref_feat_shape is not None:
        cy = cy / gh * ref_feat_shape[0]
        cx = cx / gw * ref_feat_shape[1]
    ty = np.outer(cy, freqs)  # (gh, d4)
    tx = np.outer(cx, freqs)  # (gw, d4)
    first, second = ((ty, tx) if grid_indexing == "ij" else (tx, ty))
    bcast = ((lambda a, b: (np.broadcast_to(a[:, None, :], (gh, gw, d4)),
                            np.broadcast_to(b[None, :, :], (gh, gw, d4))))
             if grid_indexing == "ij" else
             (lambda a, b: (np.broadcast_to(a[None, :, :], (gh, gw, d4)),
                            np.broadcast_to(b[:, None, :], (gh, gw, d4)))))
    f, s = bcast(first, second)
    t = np.concatenate([f, s], axis=-1).reshape(gh * gw, 2 * d4)
    return np.sin(t).astype(np.float32), np.cos(t).astype(np.float32)


def apply_rope(x: jax.Array, sin: jax.Array, cos: jax.Array,
               num_prefix: int) -> jax.Array:
    """Rotate grid tokens of (B, H, N, hd); prefix tokens pass through."""
    prefix, grid = x[:, :, :num_prefix], x[:, :, num_prefix:]
    x1, x2 = grid[..., ::2], grid[..., 1::2]
    sin = sin[None, None].astype(grid.dtype)
    cos = cos[None, None].astype(grid.dtype)
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    rot = jnp.stack([r1, r2], axis=-1).reshape(grid.shape)
    return jnp.concatenate([prefix, rot], axis=2)


class EvaAttention(nn.Module):
    dim: int
    num_heads: int
    num_prefix: int
    qk_norm: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sin, cos, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("embed", "qkv_out")),
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="k_norm")(k)
        if sin is not None:
            q = apply_rope(q, sin, cos, self.num_prefix)
            k = apply_rope(k, sin, cos, self.num_prefix)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(x.dtype)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(out)


class SwiGlu(nn.Module):
    hidden: int
    out: int
    scale_mlp: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        g = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("embed", "mlp")), name="fc1_g")(x)
        u = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("embed", "mlp")), name="fc1_x")(x)
        y = nn.silu(g) * u
        if self.scale_mlp:
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(y)
        return nn.Dense(self.out, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("mlp", "embed")), name="fc2")(y)


class EvaBlock(nn.Module):
    dim: int
    num_heads: int
    num_prefix: int
    mlp_ratio: float
    swiglu_mlp: bool
    scale_mlp: bool
    qk_norm: bool = False
    init_values: Optional[float] = None
    post_norm: bool = False
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sin, cos, deterministic: bool = True):
        c = self.dim

        def scaled(y, name):
            if self.init_values is None:
                return y
            gamma = self.param(name, nn.initializers.constant(
                self.init_values), (c,), self.param_dtype)
            return y * gamma.astype(y.dtype)

        def ln(name):
            return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)

        # post_norm: EVA-CLIP enormous residual post-norm blocks (reference
        # eva.py:391-396 EvaBlockPostNorm — norm runs on the sublayer
        # OUTPUT, and LayerScale is not used in that layout)
        y = x if self.post_norm else ln("norm1")(x)
        y = EvaAttention(c, self.num_heads, self.num_prefix, self.qk_norm,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="attn")(y, sin, cos, deterministic)
        if self.post_norm:
            y = ln("norm1")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(scaled(y, "gamma_1"), self.drop_path_rate,
                          deterministic, rng)

        y = x if self.post_norm else ln("norm2")(x)
        hidden = int(c * self.mlp_ratio)
        if self.swiglu_mlp:
            y = SwiGlu(hidden, c, self.scale_mlp, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="mlp")(
                y, deterministic)
        else:
            y = nn.Dense(hidden, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=nn.with_logical_partitioning(
                             trunc_init, ("embed", "mlp")),
                         name="mlp_fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=nn.with_logical_partitioning(
                             trunc_init, ("mlp", "embed")),
                         name="mlp_fc2")(y)
        if self.post_norm:
            y = ln("norm2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(scaled(y, "gamma_2"), self.drop_path_rate,
                             deterministic, rng)


class Eva(nn.Module):
    img_size: int = 224
    patch_size: int = 14
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4 * 2 / 3
    swiglu_mlp: bool = True
    scale_mlp: bool = True
    qk_norm: bool = False
    use_rope: bool = True
    use_abs_pos: bool = True
    class_token: bool = True
    reg_tokens: int = 0
    post_norm_blocks: bool = False
    global_pool: str = "avg"   # timm Eva default (reference eva.py:411)
    use_fc_norm: Optional[bool] = None
    use_pre_norm: bool = False
    ref_feat_shape: Optional[Tuple[int, int]] = None
    rope_grid_offset: float = 0.0
    rope_grid_indexing: str = "ij"
    init_values: Optional[float] = None
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        c = self.embed_dim
        # norm/pool resolution parity (reference eva.py:500-508): fc_norm
        # (post-pool) defaults on for avg pooling, and the trunk post-norm
        # defaults on exactly when fc_norm is off
        fc_norm = (self.use_fc_norm if self.use_fc_norm is not None
                   else self.global_pool == "avg")
        post_norm = not fc_norm
        x = x.astype(self.dtype).reshape(b, gh, p, gw, p, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * 3)
        x = nn.Dense(c, use_bias=not self.use_pre_norm, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("patch", "embed")),
                     name="patch_embed")(x)

        prefix_tokens = []
        if self.class_token:
            cls = self.param("cls_token",
                             nn.with_logical_partitioning(
                                 trunc_init, (None, None, "embed")),
                             (1, 1, c), self.param_dtype)
            prefix_tokens.append(jnp.broadcast_to(cls.astype(self.dtype),
                                                  (b, 1, c)))
        if self.reg_tokens:
            reg = self.param("reg_token",
                             nn.with_logical_partitioning(
                                 trunc_init, (None, None, "embed")),
                             (1, self.reg_tokens, c), self.param_dtype)
            prefix_tokens.append(jnp.broadcast_to(
                reg.astype(self.dtype), (b, self.reg_tokens, c)))
        num_prefix = int(self.class_token) + self.reg_tokens
        if prefix_tokens:
            x = jnp.concatenate(prefix_tokens + [x], axis=1)

        if self.use_abs_pos:
            pos = self.param("pos_embed",
                             nn.with_logical_partitioning(
                                 trunc_init, (None, None, "embed")),
                             (1, num_prefix + gh * gw, c), self.param_dtype)
            x = x + pos.astype(self.dtype)

        if self.use_pre_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm_pre")(x)

        sin = cos = None
        if self.use_rope:
            s, co = rope_2d_tables(c // self.num_heads, gh, gw,
                                   ref_feat_shape=self.ref_feat_shape,
                                   grid_offset=self.rope_grid_offset,
                                   grid_indexing=self.rope_grid_indexing)
            sin, cos = jnp.asarray(s), jnp.asarray(co)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            x = EvaBlock(c, self.num_heads, num_prefix, self.mlp_ratio,
                         self.swiglu_mlp, self.scale_mlp, self.qk_norm,
                         self.init_values, self.post_norm_blocks,
                         float(dpr[i]), dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"blocks_{i}")(x, sin, cos, deterministic)
        if post_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(x)
        if self.global_pool == "avg":
            x = x[:, num_prefix:].mean(axis=1)
        elif self.global_pool == "map":
            from vision_transformers_torch_xla_tpu.models.layers import (
                AttentionPoolLatent,
            )
            x = AttentionPoolLatent(num_heads=8, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="attn_pool")(x)
        else:
            x = x[:, 0]
        if fc_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc_norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _eva(**cfg):
    def build(**kw):
        for k in ("pretrained_tag", "remat", "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Eva(**merged)

    return build


# EVA-02 sizes: (dim, depth, heads); swiglu mlp_ratio = 4*2/3. All EVA-02
# fine-tunes reuse the 224/14 rope grid (ref_feat_shape=(16,16), reference
# eva.py:1343-1658). tiny/small use the fused GluMlp WITHOUT the inner norm
# (scale_mlp False, reference :1332-1366); base/large use SwiGLU + norm.
_EVA02 = dict(swiglu_mlp=True, scale_mlp=True, mlp_ratio=4 * 2 / 3,
              use_rope=True, use_abs_pos=True, ref_feat_shape=(16, 16))
_EVA02_TS = dict(_EVA02, scale_mlp=False)
# EVA (v1) giant: plain GELU MLP, mlp_ratio 6144/1408, no rope
_EVA1 = dict(swiglu_mlp=False, scale_mlp=False, mlp_ratio=6144 / 1408,
             use_rope=False, use_abs_pos=True)

# name -> config. Dims mirror the reference entrypoints (eva.py registry).
_VARIANTS = {
    "eva_giant_patch14_224": dict(_EVA1, embed_dim=1408, depth=40,
                                  num_heads=16, patch_size=14, img_size=224),
    "eva_giant_patch14_336": dict(_EVA1, embed_dim=1408, depth=40,
                                  num_heads=16, patch_size=14, img_size=336),
    "eva_giant_patch14_560": dict(_EVA1, embed_dim=1408, depth=40,
                                  num_heads=16, patch_size=14, img_size=560),
    "eva_giant_patch14_clip_224": dict(_EVA1, embed_dim=1408, depth=40,
                                       num_heads=16, patch_size=14,
                                       img_size=224,
                                  global_pool="token"),
    "eva02_tiny_patch14_224": dict(_EVA02_TS, embed_dim=192, depth=12,
                                   num_heads=3, patch_size=14, img_size=224),
    "eva02_tiny_patch14_336": dict(_EVA02_TS, embed_dim=192, depth=12,
                                   num_heads=3, patch_size=14, img_size=336),
    "eva02_small_patch14_224": dict(_EVA02_TS, embed_dim=384, depth=12,
                                    num_heads=6, patch_size=14, img_size=224),
    "eva02_small_patch14_336": dict(_EVA02_TS, embed_dim=384, depth=12,
                                    num_heads=6, patch_size=14, img_size=336),
    "eva02_base_patch14_224": dict(_EVA02, embed_dim=768, depth=12,
                                   num_heads=12, patch_size=14, img_size=224),
    "eva02_base_patch14_448": dict(_EVA02, embed_dim=768, depth=12,
                                   num_heads=12, patch_size=14, img_size=448),
    "eva02_large_patch14_224": dict(_EVA02, embed_dim=1024, depth=24,
                                    num_heads=16, patch_size=14,
                                    img_size=224),
    "eva02_large_patch14_448": dict(_EVA02, embed_dim=1024, depth=24,
                                    num_heads=16, patch_size=14,
                                    img_size=448),
    "eva02_base_patch16_clip_224": dict(_EVA02, embed_dim=768, depth=12,
                                        num_heads=12, patch_size=16,
                                        img_size=224,
                                  global_pool="token"),
    "eva02_large_patch14_clip_224": dict(_EVA02, embed_dim=1024, depth=24,
                                         num_heads=16, patch_size=14,
                                         img_size=224,
                                  global_pool="token"),
    "eva02_large_patch14_clip_336": dict(_EVA02, embed_dim=1024, depth=24,
                                         num_heads=16, patch_size=14,
                                         img_size=336,
                                  global_pool="token"),
    "eva02_enormous_patch14_clip_224": dict(
        _EVA1, embed_dim=1792, depth=64, num_heads=16, patch_size=14,
        img_size=224, mlp_ratio=15360 / 1792, global_pool="token",
        post_norm_blocks=True),
    # rope + register-token + GAP ViTs that live in reference eva.py
    "vit_medium_patch16_rope_reg1_gap_256": dict(
        _EVA02, swiglu_mlp=False, scale_mlp=False, mlp_ratio=4.0,
        embed_dim=512, depth=12, num_heads=8, patch_size=16, img_size=256,
        class_token=False, reg_tokens=1, global_pool="avg",
        use_abs_pos=False, init_values=1e-5),
    "vit_mediumd_patch16_rope_reg1_gap_256": dict(
        _EVA02, swiglu_mlp=False, scale_mlp=False, mlp_ratio=4.0,
        embed_dim=512, depth=20, num_heads=8, patch_size=16, img_size=256,
        class_token=False, reg_tokens=1, global_pool="avg",
        use_abs_pos=False, init_values=1e-5),
    "vit_betwixt_patch16_rope_reg4_gap_256": dict(
        _EVA02, swiglu_mlp=False, scale_mlp=False, mlp_ratio=4.0,
        embed_dim=640, depth=12, num_heads=10, patch_size=16, img_size=256,
        class_token=False, reg_tokens=4, global_pool="avg",
        use_abs_pos=False, init_values=1e-5),
    "vit_base_patch16_rope_reg1_gap_256": dict(
        _EVA02, swiglu_mlp=False, scale_mlp=False, mlp_ratio=4.0,
        embed_dim=768, depth=12, num_heads=12, patch_size=16, img_size=256,
        class_token=False, reg_tokens=1, global_pool="avg",
        use_abs_pos=False, init_values=1e-5),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _eva(**_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = f"EVA variant {_name!r} (reference eva.py registry surface)."
    setattr(_mod, _name, register_model(_fn))


# Perception Encoder ViTs (reference eva.py vit_pe_* registrations):
# rope attention, pre-transformer norm folded into the trunk norm here,
# map (attention) pooling for the core variants
_PE = dict(swiglu_mlp=False, scale_mlp=False, use_rope=True,
           use_abs_pos=True, use_pre_norm=True,
           rope_grid_indexing="xy")
for _n, _c in {
        "vit_pe_core_base_patch16_224": dict(
            _PE, patch_size=16, img_size=224, embed_dim=768, depth=12,
            num_heads=12, mlp_ratio=4.0, global_pool="map",
            ref_feat_shape=(14, 14), rope_grid_offset=1.0),
        "vit_pe_core_large_patch14_336": dict(
            _PE, patch_size=14, img_size=336, embed_dim=1024, depth=24,
            num_heads=16, mlp_ratio=4.0, global_pool="map",
            ref_feat_shape=(24, 24), rope_grid_offset=1.0),
        "vit_pe_core_gigantic_patch14_448": dict(
            _PE, patch_size=14, img_size=448, embed_dim=1536, depth=50,
            num_heads=16, mlp_ratio=8960 / 1536, class_token=False,
            global_pool="map", ref_feat_shape=(32, 32)),
        "vit_pe_lang_large_patch14_448": dict(
            _PE, patch_size=14, img_size=448, embed_dim=1024, depth=23,
            num_heads=16, mlp_ratio=4.0, init_values=0.1,
            global_pool="token", ref_feat_shape=(32, 32),
            rope_grid_offset=1.0),
        "vit_pe_lang_gigantic_patch14_448": dict(
            _PE, patch_size=14, img_size=448, embed_dim=1536, depth=47,
            num_heads=16, mlp_ratio=8960 / 1536, class_token=False,
            init_values=0.1, global_pool="avg", ref_feat_shape=(32, 32)),
        "vit_pe_spatial_gigantic_patch14_448": dict(
            _PE, patch_size=14, img_size=448, embed_dim=1536, depth=50,
            num_heads=16, mlp_ratio=8960 / 1536, class_token=False,
            init_values=0.1, global_pool="avg", ref_feat_shape=(32, 32)),
}.items():
    _fn = _eva(**_c)
    _fn.__name__ = _n
    _fn.__qualname__ = _n
    _fn.__doc__ = (f"Perception Encoder variant {_n!r} (reference eva.py "
                   f"registry surface).")
    setattr(_mod, _n, register_model(_fn))
