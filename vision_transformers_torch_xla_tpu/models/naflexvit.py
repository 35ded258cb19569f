"""NaFlexVit: variable-resolution / variable-aspect ViT, TPU-native.

Capability parity with the reference's naflexvit.py (1,792 LoC;
reference models/naflexvit.py:67-133 NaFlexVitCfg, :188-815 NaFlexEmbeds,
:818-884 create_attention_mask, :887-958 global_pool_naflex, :961-1454
NaFlexVit, :1639-1793 the 8 register_model_safe entrypoints). Supports:

  * standard image inputs [B, H, W, C] (NHWC here) — patchified statically;
  * NaFlex mode: pre-patchified [B, N, P*P*C] token buffers with
    ``patch_coord`` [B, N, 2] (y, x) and ``patch_valid`` [B, N] masks —
    variable aspect/resolution rides a STATIC padded sequence, so one jit
    trace serves every aspect ratio in the batch (the reference pads via
    its NaFlex collator the same way: pad_sequence + validity mask);
  * learned / factorized / none position embeddings with per-sample
    interpolation, optionally aspect-ratio preserving;
  * masked attention over padding tokens, masked avg/max/avgmax pooling,
    masked MAP (AttentionPoolLatent) pooling.

TPU-first design notes.  The reference interpolates the pos-embed table
per *unique grid size* with data-dependent Python loops
(naflexvit.py:426-480) — untraceable under jit.  Its alternative
``pos_embed_use_grid_sample`` path (:482-526) is affine resampling; for
output grid (h_i, w_i), F.affine_grid+grid_sample with align_corners=False
reduces in closed form to sampling the table at
``p = (coord + 0.5) * table_size / grid_i - 0.5`` with border clamping.
We implement exactly that closed form as 4-tap bilinear gathers — fully
traced, static shapes, no host sync — and use it for BOTH cfg settings
(the flag is accepted for config parity; semantics follow the grid-sample
path, which is numerically identical for the integer-coordinate case).
Attention masking is key-side only: padded queries produce garbage rows
that pooling masks out, while valid-token outputs are bit-identical to
the reference's symmetric mask (naflexvit.py:870-882) at ~half the mask
bandwidth.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    LayerScale,
    _dense,
    _layer_norm,
    act_fn,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = ["NaFlexVit", "batch_patchify"]

_NEG = -1e9  # finite mask fill: softmax over a fully-masked row stays
# finite (uniform), mirroring the reference's finfo.min masked_fill
# (naflexvit.py:880-882) rather than -inf NaNs.


def batch_patchify(x: jax.Array, patch_size: Tuple[int, int],
                   pad: bool = True) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B, H, W, C] -> ([B, N, ph*pw*C], (nh, nw)), channels-last patch
    layout (ph, pw, C) matching reference naflexvit.py:148-177 so linear
    projection weights interchange with torch checkpoints."""
    b, h, w, c = x.shape
    ph, pw = patch_size
    if pad and (h % ph or w % pw):
        x = jnp.pad(x, ((0, 0), (0, (ph - h % ph) % ph),
                        (0, (pw - w % pw) % pw), (0, 0)))
        h, w = x.shape[1], x.shape[2]
    nh, nw = h // ph, w // pw
    x = x[:, :nh * ph, :nw * pw]
    x = x.reshape(b, nh, ph, nw, pw, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, nh * nw, ph * pw * c), (nh, nw)


def _sample_1d(table: jax.Array, pos: jax.Array) -> jax.Array:
    """Border-clamped linear sampling of a (L, C) table at float positions
    ``pos`` [...]; returns [..., C]."""
    length = table.shape[0]
    p0 = jnp.floor(pos)
    w1 = (pos - p0)[..., None]
    p0i = p0.astype(jnp.int32)
    i0 = jnp.clip(p0i, 0, length - 1)
    i1 = jnp.clip(p0i + 1, 0, length - 1)
    return table[i0] * (1.0 - w1) + table[i1] * w1


def _sample_2d(table: jax.Array, ypos: jax.Array, xpos: jax.Array) -> jax.Array:
    """Border-clamped bilinear sampling of a (H, W, C) table at float
    (ypos, xpos) [...]; returns [..., C].  Closed form of the reference's
    affine_grid+grid_sample pos-embed path (naflexvit.py:482-526)."""
    h, w, c = table.shape
    flat = table.reshape(h * w, c)
    y0 = jnp.floor(ypos)
    x0 = jnp.floor(xpos)
    wy = (ypos - y0)[..., None]
    wx = (xpos - x0)[..., None]
    y0f = y0.astype(jnp.int32)
    x0f = x0.astype(jnp.int32)
    y0i = jnp.clip(y0f, 0, h - 1)
    y1i = jnp.clip(y0f + 1, 0, h - 1)
    x0i = jnp.clip(x0f, 0, w - 1)
    x1i = jnp.clip(x0f + 1, 0, w - 1)
    top = flat[y0i * w + x0i] * (1 - wx) + flat[y0i * w + x1i] * wx
    bot = flat[y1i * w + x0i] * (1 - wx) + flat[y1i * w + x1i] * wx
    return top * (1 - wy) + bot * wy


def _grid_pos(coord: jax.Array, grid: jax.Array, table_len: int) -> jax.Array:
    """Map integer patch coords in a grid of (traced) size ``grid`` to
    continuous table positions: (c + 0.5) * L / g - 0.5 — the exact
    align_corners=False composition of the reference's affine_grid scale
    (scale = G/g, translate = scale - 1) with grid_sample's unnormalize."""
    return (coord.astype(jnp.float32) + 0.5) * (table_len / grid) - 0.5


class MaskedAttention(nn.Module):
    """Self-attention with optional key-side validity masking.

    Parity: the reference routes NaFlex masks through timm Attention's
    attn_mask (vision_transformer.py Block via naflexvit.py:1343-1346).
    fp32 scores/softmax; masked keys get a finite -1e9 before softmax.
    """

    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    proj_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, valid: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = _dense(3 * d, ("embed", "qkv_out"), self.qkv_bias,
                     self.dtype, self.param_dtype, "qkv")(x)
        qkv = qkv.reshape(b, s, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="k_norm")(k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        if valid is not None:
            scores = jnp.where(valid[:, None, None, :], scores, _NEG)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.attn_drop)(p, deterministic=deterministic)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        o = _dense(d, ("qkv_out", "embed"), self.proj_bias, self.dtype,
                   self.param_dtype, "proj")(o)
        return nn.Dropout(self.proj_drop)(o, deterministic=deterministic)


class NaFlexBlock(nn.Module):
    """Pre-norm block with masked attention (reference vision_transformer
    Block as driven by naflexvit.py forward_features :1343-1350)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    proj_bias: bool = True
    init_values: Optional[float] = None
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    act: str = "gelu"
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, valid: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        a = MaskedAttention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm, proj_bias=self.proj_bias,
            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(_layer_norm(self.dtype, self.param_dtype, "norm1",
                      eps=self.norm_eps)(x), valid, deterministic)
        if self.init_values is not None:
            a = LayerScale(d, self.init_values, self.param_dtype,
                           name="ls1")(a)
        rate_off = self.drop_path_rate == 0.0
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        x = x + drop_path(a, self.drop_path_rate, deterministic, rng)
        m = Mlp(hidden_dim=int(d * self.mlp_ratio), out_dim=d,
                dropout=self.proj_drop, act=self.act, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp",
                )(_layer_norm(self.dtype, self.param_dtype, "norm2",
                              eps=self.norm_eps)(x), deterministic)
        if self.init_values is not None:
            m = LayerScale(d, self.init_values, self.param_dtype,
                           name="ls2")(m)
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        return x + drop_path(m, self.drop_path_rate, deterministic, rng)


class MaskedAttentionPoolLatent(nn.Module):
    """MAP head with key-side validity masking (reference naflexvit.py
    _pool :1355-1372 builds a non-symmetric q_len=1 mask for attn_pool).
    Param tree matches layers.AttentionPoolLatent (latent/q/kv/proj/
    norm/mlp) so converters treat both identically."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 valid: Optional[jax.Array] = None) -> jax.Array:
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        latent = self.param(
            "latent",
            nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
            (1, 1, d), self.param_dtype).astype(x.dtype)
        q = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "q")(jnp.broadcast_to(latent, (b, 1, d)))
        kv = _dense(2 * d, ("embed", "qkv_out"), True, self.dtype,
                    self.param_dtype, "kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        if valid is not None:
            scores = jnp.where(valid[:, None, None, :], scores, _NEG)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        o = _dense(d, ("qkv_out", "embed"), True, self.dtype,
                   self.param_dtype, "proj")(o)
        o = o + Mlp(int(d * self.mlp_ratio), d, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mlp")(
            _layer_norm(self.dtype, self.param_dtype, "norm")(o))
        return o[:, 0]


class NaFlexVit(nn.Module):
    """Flax NaFlexVit (reference models/naflexvit.py:961-1454).

    Fields mirror NaFlexVitCfg (:67-133); defaults match the torch
    dataclass (class_token=False, global_pool='map', pos grid 16x16).
    """

    img_size: int = 384                         # standard-mode input (cfg
    # input_size 384, reference naflexvit.py:1549)
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    proj_bias: bool = True
    init_values: Optional[float] = None
    class_token: bool = False
    reg_tokens: int = 0
    pos_embed: str = "learned"                  # 'learned'|'factorized'|'none'
    pos_embed_grid_size: Tuple[int, int] = (16, 16)
    pos_embed_ar_preserving: bool = False
    pos_embed_use_grid_sample: bool = False     # accepted for cfg parity;
    # both settings run the grid-sample closed form (module docstring)
    dynamic_img_pad: bool = False
    pre_norm: bool = False
    final_norm: bool = True
    fc_norm: Optional[bool] = None
    global_pool: str = "map"                    # ''|'avg'|'avgmax'|'max'|
    # 'token'|'map'
    pool_include_prefix: bool = False
    act_layer: str = "gelu"
    norm_eps: float = 1e-6
    drop_rate: float = 0.0
    pos_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    embed_proj_type: str = "linear"             # NaFlex always patchifies to
    # tokens; 'linear' is the only TPU path (a stride-p conv IS this matmul)
    remat: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.reg_tokens

    def _pos_embed_tokens(self, x: jax.Array, coord: jax.Array,
                          grid_hw: jax.Array) -> jax.Array:
        """Add interpolated pos embeds at per-sample patch coords.

        coord: [B, N, 2] (y, x) int; grid_hw: [B, 2] per-sample grid size.
        Parity: reference naflexvit.py:482-526 (learned grid-sample path)
        and :624-669 (factorized grid-sample path).
        """
        h0, w0 = self.pos_embed_grid_size
        if self.pos_embed_ar_preserving:
            div = jnp.maximum(grid_hw[:, 0], grid_hw[:, 1]).astype(jnp.float32)
            div_y = div_x = div[:, None]        # [B, 1]
        else:
            div_y = grid_hw[:, 0:1].astype(jnp.float32)
            div_x = grid_hw[:, 1:2].astype(jnp.float32)
        ypos = _grid_pos(coord[..., 0], div_y, h0)
        xpos = _grid_pos(coord[..., 1], div_x, w0)
        if self.pos_embed == "factorized":
            tab_y = self.param(
                "pos_embed_y",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), (None, "seq", "embed")),
                (1, h0, self.embed_dim), self.param_dtype)
            tab_x = self.param(
                "pos_embed_x",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), (None, "seq", "embed")),
                (1, w0, self.embed_dim), self.param_dtype)
            pe = (_sample_1d(tab_y[0], ypos) + _sample_1d(tab_x[0], xpos))
        else:
            tab = self.param(
                "pos_embed",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), (None, "seq", None, "embed")),
                (1, h0, w0, self.embed_dim), self.param_dtype)
            pe = _sample_2d(tab[0], ypos, xpos)
        return x + pe.astype(x.dtype)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 patch_coord: Optional[jax.Array] = None,
                 patch_valid: Optional[jax.Array] = None,
                 pre_logits: bool = False) -> jax.Array:
        x = self.forward_features(x, deterministic, patch_coord=patch_coord,
                                  patch_valid=patch_valid)
        return self.forward_head(x, deterministic, patch_valid=patch_valid,
                                 pre_logits=pre_logits)

    def forward_features(self, x: jax.Array, deterministic: bool = True,
                         patch_coord: Optional[jax.Array] = None,
                         patch_valid: Optional[jax.Array] = None) -> jax.Array:
        """Parity: reference naflexvit.py:1324-1353 forward_features +
        NaFlexEmbeds.forward :713-815."""
        p = self.patch_size
        if patch_coord is None:
            # standard 2D mode: NHWC image -> static patch grid
            if x.ndim != 4:
                raise ValueError("standard mode expects [B, H, W, C] input; "
                                 "pass patch_coord for pre-patchified mode")
            x, (nh, nw) = batch_patchify(x, (p, p), pad=self.dynamic_img_pad)
            b, n, _ = x.shape
            yy, xx = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw),
                                  indexing="ij")
            patch_coord = jnp.broadcast_to(
                jnp.stack([yy.reshape(-1), xx.reshape(-1)], -1)[None],
                (b, n, 2))
            grid_hw = jnp.broadcast_to(jnp.array([[nh, nw]]), (b, 2))
        else:
            if x.ndim != 3:
                raise ValueError("NaFlex mode expects [B, N, P*P*C] patches")
            b, n, _ = x.shape
            # per-sample grid from coords; padding coords must not inflate
            # it (reference calculate_naflex_grid_sizes :180-184)
            cc = patch_coord
            if patch_valid is not None:
                cc = jnp.where(patch_valid[..., None], patch_coord, 0)
            grid_hw = jnp.max(cc, axis=1) + 1
        x = x.astype(self.dtype)
        x = _dense(self.embed_dim, ("patch", "embed"),
                   self.proj_bias and not self.pre_norm,
                   self.dtype, self.param_dtype, "proj")(x)
        if self.pos_embed not in ("", "none"):
            x = self._pos_embed_tokens(x, patch_coord, grid_hw)

        npt = self.num_prefix_tokens
        prefix = []
        if self.class_token:
            cls = self.param(
                "cls_token",
                nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                (1, 1, self.embed_dim), self.param_dtype)
            prefix.append(jnp.broadcast_to(cls.astype(x.dtype),
                                           (b, 1, self.embed_dim)))
        if self.reg_tokens:
            reg = self.param(
                "reg_token",
                nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
                (1, self.reg_tokens, self.embed_dim), self.param_dtype)
            prefix.append(jnp.broadcast_to(
                reg.astype(x.dtype), (b, self.reg_tokens, self.embed_dim)))
        if prefix:
            x = jnp.concatenate(prefix + [x], axis=1)
        x = nn.Dropout(self.pos_drop_rate)(x, deterministic=deterministic)
        if self.pre_norm:
            x = _layer_norm(self.dtype, self.param_dtype, "norm_pre",
                            eps=self.norm_eps)(x)

        valid = None
        if patch_valid is not None:
            valid = jnp.concatenate(
                [jnp.ones((b, npt), bool), patch_valid.astype(bool)], axis=1)

        block_cls = NaFlexBlock
        if self.remat:
            block_cls = nn.remat(
                block_cls, static_argnums=(3,),
                policy=jax.checkpoint_policies.nothing_saveable)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_norm=self.qk_norm,
                proj_bias=self.proj_bias, init_values=self.init_values,
                drop_path_rate=dpr, proj_drop=self.proj_drop_rate,
                attn_drop=self.attn_drop_rate, act=self.act_layer,
                norm_eps=self.norm_eps, dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}")(x, valid, deterministic)
            self.sow("intermediates", f"block_{i}", x)
        use_fc_norm = self.fc_norm if self.fc_norm is not None else \
            self.global_pool == "avg"
        if self.final_norm and not use_fc_norm:
            # norm and fc_norm are mutually exclusive in NaFlexVit
            # (reference naflexvit.py:1073,1091)
            x = _layer_norm(self.dtype, self.param_dtype, "norm",
                            eps=self.norm_eps)(x)
        return x

    def forward_head(self, x: jax.Array, deterministic: bool = True,
                     patch_valid: Optional[jax.Array] = None,
                     pre_logits: bool = False) -> jax.Array:
        """Masked pooling + fc_norm + head (reference naflexvit.py
        :887-958 global_pool_naflex, :1355-1394 _pool/forward_head)."""
        b = x.shape[0]
        npt = self.num_prefix_tokens
        if self.global_pool == "map":
            if self.pool_include_prefix:
                valid = None if patch_valid is None else jnp.concatenate(
                    [jnp.ones((b, npt), bool), patch_valid.astype(bool)], 1)
            else:
                x = x[:, npt:]
                valid = None if patch_valid is None \
                    else patch_valid.astype(bool)
            pooled = MaskedAttentionPoolLatent(
                self.num_heads, self.mlp_ratio, dtype=self.dtype,
                param_dtype=self.param_dtype, name="attn_pool")(x, valid)
        elif self.global_pool == "token":
            pooled = x[:, 0]
        elif self.global_pool in ("avg", "avgmax", "max"):
            if self.pool_include_prefix:
                valid = None if patch_valid is None else jnp.concatenate(
                    [jnp.ones((b, npt), bool), patch_valid.astype(bool)], 1)
            else:
                x = x[:, npt:]
                valid = None if patch_valid is None \
                    else patch_valid.astype(bool)
            if valid is None:
                valid = jnp.ones(x.shape[:2], bool)
            vf = valid.astype(jnp.float32)[..., None]
            xf = x.astype(jnp.float32)
            avg = (xf * vf).sum(1) / jnp.clip(vf.sum(1), 1.0)
            if self.global_pool == "avg":
                pooled = avg.astype(x.dtype)
            else:
                mx = jnp.where(valid[..., None], xf, _NEG).max(1)
                pooled = (mx if self.global_pool == "max"
                          else 0.5 * (avg + mx)).astype(x.dtype)
        else:
            return x if pre_logits or self.num_classes == 0 else x
        use_fc_norm = self.fc_norm if self.fc_norm is not None else \
            self.global_pool == "avg"
        if self.final_norm and use_fc_norm:
            pooled = _layer_norm(self.dtype, self.param_dtype, "fc_norm",
                                 eps=self.norm_eps)(pooled)
        pooled = nn.Dropout(self.drop_rate)(pooled,
                                            deterministic=deterministic)
        if pre_logits or self.num_classes == 0:
            return pooled
        logits = _dense(self.num_classes, ("embed", "classes"), True,
                        self.dtype, self.param_dtype, "head")(pooled)
        return logits.astype(jnp.float32)


def from_classic_cfg(**kw) -> NaFlexVit:
    """Build a NaFlexVit from classic VisionTransformer kwargs — the
    ``use_naflex`` delegation (reference vision_transformer.py:2655-2664
    -> naflexvit.py:1598-1636 _create_naflexvit_from_classic)."""
    kw.pop("pretrained_tag", None)
    for drop in ("no_embed_class", "dynamic_img_size", "block_type",
                 "norm_type", "swiglu_mlp", "mlp_hidden", "use_pallas_attn",
                 "use_pallas_mlp", "scan_blocks", "remat_policy", "pos_grid",
                 "patch_drop_rate"):
        kw.pop(drop, None)
    gp = kw.pop("global_pool", "token")
    fc_norm = kw.pop("fc_norm", None)
    if fc_norm is None and gp == "avg":
        fc_norm = True
    img = kw.pop("img_size", 224)
    patch = kw.get("patch_size", 16)
    kw.setdefault("class_token", True)
    return NaFlexVit(
        img_size=img, global_pool=gp, fc_norm=fc_norm,
        pos_embed_grid_size=(img // patch, img // patch), **kw)


def _naflexvit(name: str, **cfg):
    def build(**kw):
        kw.pop("pretrained_tag", None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return NaFlexVit(**merged)

    build.__name__ = name
    build.__qualname__ = name
    build.__doc__ = (f"NaFlexVit variant {name!r} (reference "
                     f"models/naflexvit.py:1639-1793 entrypoints).")
    import sys

    setattr(sys.modules[__name__], name, register_model(build))


# The 8 reference entrypoints (naflexvit.py:1639-1793), registered there
# via the custom `register_model_safe` wrapper (:55-64).
_naflexvit("naflexvit_base_patch16_gap", patch_size=16, embed_dim=768,
           depth=12, num_heads=12, init_values=1e-5, global_pool="avg",
           reg_tokens=4, fc_norm=True)
_naflexvit("naflexvit_base_patch16_par_gap", patch_size=16, embed_dim=768,
           depth=12, num_heads=12, init_values=1e-5,
           pos_embed_ar_preserving=True, global_pool="avg", reg_tokens=4,
           fc_norm=True)
_naflexvit("naflexvit_base_patch16_parfac_gap", patch_size=16,
           embed_dim=768, depth=12, num_heads=12, init_values=1e-5,
           pos_embed_ar_preserving=True, pos_embed="factorized",
           global_pool="avg", reg_tokens=4, fc_norm=True)
_naflexvit("naflexvit_base_patch16_map", patch_size=16, embed_dim=768,
           depth=12, num_heads=12, init_values=1e-5, global_pool="map",
           reg_tokens=1)
_naflexvit("naflexvit_so150m2_patch16_reg1_gap", patch_size=16,
           embed_dim=832, depth=21, num_heads=13, mlp_ratio=34 / 13,
           init_values=1e-5, qkv_bias=False, reg_tokens=1,
           global_pool="avg", fc_norm=True)
_naflexvit("naflexvit_so150m2_patch16_reg1_map", patch_size=16,
           embed_dim=832, depth=21, num_heads=13, mlp_ratio=34 / 13,
           init_values=1e-5, qkv_bias=False, reg_tokens=1,
           global_pool="map")
_naflexvit("naflexvit_base_patch16_siglip", patch_size=16, embed_dim=768,
           depth=12, num_heads=12, act_layer="gelu_tanh", global_pool="map")
_naflexvit("naflexvit_so400m_patch16_siglip", patch_size=16,
           embed_dim=1152, depth=27, num_heads=16, mlp_ratio=3.7362,
           act_layer="gelu_tanh", global_pool="map")
