"""MetaFormer baselines (PoolFormer v1/v2, ConvFormer, CAFormer) in Flax.

Parity with the reference's metaformer.py (1120 LoC; SURVEY §2.2): one
4-stage MetaFormer trunk parameterized by its per-stage token mixer —

* ``pool``  — 3x3 average-pool residual mixer (PoolFormer)
* ``sep``   — pointwise-expand -> 7x7 depthwise -> pointwise, all bias-free
  (ConvFormer; reference metaformer.py:240-271)
* ``attn``  — plain multi-head attention (head_dim 32, bias-free qkv/proj;
  reference metaformer.py:159-215) over flattened tokens (CAFormer
  stages 3-4)

Family split (reference variant kwargs, metaformer.py:900-1189):

* v1 PoolFormer — GELU MLPs with bias, GroupNorm1 block norms (single-group
  GroupNorm over (H, W, C), eps 1e-5), LayerScale (1e-5/1e-6), plain Linear
  head, no stem/downsample norms.
* v2 (poolformerv2 / convformer / caformer) — StarReLU, bias-free
  LayerNorm block/downsample norms (eps 1e-6), bias-free MLPs, ResScale on
  stages 3-4 (init 1.0; reference res_scale_init_values=(None,None,1,1)),
  stem conv->norm + per-stage norm->conv downsampling
  (metaformer.py:50-105), and an MLP classifier head
  (fc1 -> relu^2 -> LayerNorm -> fc2; MlpHead, metaformer.py:290-318).

NHWC throughout; 1x1 convs are Dense on the channel axis (MXU-direct).
Checkpoint converters: ckpt/torch_compat.py::convert_metaformer_state_dict
and ckpt/torch_export.py::export_metaformer_state_dict.
"""
from __future__ import annotations

from typing import Optional, Sequence

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


class StarReLU(nn.Module):
    """s * relu(x)^2 + b with learned scalars (reference metaformer.py:135)."""

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(0.8944), ())
        b = self.param("bias", nn.initializers.constant(-0.4472), ())
        r = nn.relu(x)
        return (s.astype(x.dtype) * r * r + b.astype(x.dtype))


class MetaFormerBlock(nn.Module):
    dim: int
    mixer: str  # 'pool' | 'sep' | 'attn'
    mlp_ratio: float = 4.0
    star_relu: bool = True      # v2: StarReLU act + bias-free norms/MLPs
    group_norm: bool = False    # GroupNorm1 block norms (poolformer v1/v2)
    layer_scale: float = 0.0
    res_scale: bool = False
    num_heads: int = 8
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _act(self, x, name):
        if self.star_relu:
            return StarReLU(name=name)(x)
        return nn.gelu(x, approximate=False)

    def _norm(self, x, name):
        if self.group_norm:
            # GroupNorm1 — single group over (H, W, C), torch eps 1e-5;
            # bias-free in poolformerv2 (GroupNorm1NoBias), biased in v1
            return nn.GroupNorm(num_groups=1, epsilon=1e-5,
                                use_bias=not self.star_relu,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)(x)
        # convformer/caformer: LayerNorm2dNoBias, eps 1e-6
        return nn.LayerNorm(epsilon=1e-6, use_bias=not self.star_relu,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)(x)

    def _scale(self, y, name):
        if not self.layer_scale:
            return y
        g = self.param(name, nn.initializers.constant(self.layer_scale),
                       (self.dim,), self.param_dtype)
        return y * g.astype(y.dtype)

    def _res(self, x, name):
        if not self.res_scale:
            return x
        g = self.param(name, nn.initializers.ones, (self.dim,),
                       self.param_dtype)
        return x * g.astype(x.dtype)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        bias = not self.star_relu  # v2 MLPs/mixers are bias-free
        y = self._norm(x, "norm1")
        if self.mixer == "pool":
            y = nn.avg_pool(y, (3, 3), strides=(1, 1), padding="SAME") - y
        elif self.mixer == "sep":
            mid = int(c * 2)
            y = nn.Dense(mid, use_bias=bias, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="mix_pw1")(y)
            y = self._act(y, "mix_act")
            y = nn.Conv(mid, (7, 7), feature_group_count=mid, use_bias=bias,
                        padding="SAME", dtype=self.dtype,
                        param_dtype=self.param_dtype, name="mix_dw")(y)
            y = nn.Dense(c, use_bias=bias, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="mix_pw2")(y)
        else:  # attn — head_dim 32, qkv/proj bias-free (metaformer.py:189)
            hd = 32
            heads = max(c // hd, 1)
            t = y.reshape(b, h * w, c)
            qkv = nn.Dense(3 * heads * hd, use_bias=False, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           kernel_init=nn.with_logical_partitioning(
                               trunc_init, ("embed", "qkv_out")),
                           name="mix_qkv")(t)
            qkv = qkv.reshape(b, h * w, 3, heads, hd)
            qkv = qkv.transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            a = jax.nn.softmax(a * hd ** -0.5, axis=-1)
            t = jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            t = t.transpose(0, 2, 1, 3).reshape(b, h * w, heads * hd)
            t = t.astype(x.dtype)
            y = nn.Dense(c, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         kernel_init=nn.with_logical_partitioning(
                             trunc_init, ("qkv_out", "embed")),
                         name="mix_proj")(t).reshape(b, h, w, c)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = self._res(x, "rs1") + drop_path(
            self._scale(y, "ls1"), self.drop_path_rate, deterministic, rng)

        y = self._norm(x, "norm2")
        y = nn.Dense(int(c * self.mlp_ratio), use_bias=bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(y)
        y = self._act(y, "mlp_act")
        y = nn.Dense(c, use_bias=bias, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return self._res(x, "rs2") + drop_path(
            self._scale(y, "ls2"), self.drop_path_rate, deterministic, rng)


class MetaFormer(nn.Module):
    depths: Sequence[int] = (2, 2, 6, 2)
    dims: Sequence[int] = (64, 128, 320, 512)
    mixers: Sequence[str] = ("pool", "pool", "pool", "pool")
    star_relu: bool = True
    group_norm: bool = False
    layer_scale: float = 0.0
    # reference default res_scale_init_values=(None, None, 1.0, 1.0) for the
    # v2 family; v1 PoolFormer passes None (metaformer.py:910/487)
    res_scales: Optional[Sequence[bool]] = None
    use_mlp_head: Optional[bool] = None   # default: star_relu (v2)
    downsample_norm: Optional[bool] = None  # default: star_relu (v2)
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        ds_norm = self.star_relu if self.downsample_norm is None \
            else self.downsample_norm
        mlp_head = self.star_relu if self.use_mlp_head is None \
            else self.use_mlp_head
        res = self.res_scales
        if res is None:
            res = tuple(self.star_relu and si >= 2
                        for si in range(len(self.depths)))
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for si, (depth, dim, mixer) in enumerate(zip(self.depths, self.dims,
                                                     self.mixers)):
            if si == 0:
                # Stem: conv k7 s4 p2, then norm (reference metaformer.py:63)
                x = nn.Conv(dim, (7, 7), strides=4, padding=[(2, 2)] * 2,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="downsample_0")(x)
                if ds_norm:
                    x = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name="downsample_0_norm")(x)
            else:
                # Downsampling: norm BEFORE conv (reference metaformer.py:93)
                if ds_norm:
                    x = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"downsample_{si}_norm")(x)
                x = nn.Conv(dim, (3, 3), strides=2, padding=[(1, 1)] * 2,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"downsample_{si}")(x)
            for blk in range(depth):
                x = MetaFormerBlock(dim, mixer, self.mlp_ratio,
                                    self.star_relu, self.group_norm,
                                    self.layer_scale,
                                    res_scale=bool(res[si]),
                                    drop_path_rate=float(dpr[bi]),
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"stages_{si}_blocks_{blk}")(
                    x, deterministic)
                bi += 1
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)
        x = x.mean(axis=(1, 2))
        # head: pool -> output_norm (LayerNorm2d, biased, eps 1e-6) -> fc
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        if mlp_head:
            # MlpHead: fc1 -> relu^2 -> LayerNorm(eps 1e-6) -> fc2
            # (reference metaformer.py:290-318; SquaredReLU, biased fcs)
            x = nn.Dense(int(4 * self.dims[-1]), dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_fc1")(x)
            r = nn.relu(x)
            x = r * r
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="head_norm")(x)
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="head_fc2")(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _mf(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return MetaFormer(**merged)

    return build


_POOL = ("pool",) * 4
_CONV = ("sep",) * 4
_CA = ("sep", "sep", "attn", "attn")
_S_DIMS = (64, 128, 320, 512)
_M_DIMS = (96, 192, 384, 576)
_B_DIMS = (128, 256, 512, 768)
_PM_DIMS = (96, 192, 384, 768)

_VARIANTS = {
    # PoolFormer v1: GELU + LayerScale, GroupNorm1 norms, plain head
    "poolformer_s12": dict(depths=(2, 2, 6, 2), dims=_S_DIMS, mixers=_POOL,
                           star_relu=False, group_norm=True,
                           layer_scale=1e-5),
    "poolformer_s24": dict(depths=(4, 4, 12, 4), dims=_S_DIMS, mixers=_POOL,
                           star_relu=False, group_norm=True,
                           layer_scale=1e-5),
    "poolformer_s36": dict(depths=(6, 6, 18, 6), dims=_S_DIMS, mixers=_POOL,
                           star_relu=False, group_norm=True,
                           layer_scale=1e-6),
    "poolformer_m36": dict(depths=(6, 6, 18, 6), dims=_PM_DIMS, mixers=_POOL,
                           star_relu=False, group_norm=True,
                           layer_scale=1e-6),
    "poolformer_m48": dict(depths=(8, 8, 24, 8), dims=_PM_DIMS, mixers=_POOL,
                           star_relu=False, group_norm=True,
                           layer_scale=1e-6),
    # poolformerv2: StarReLU + GroupNorm1NoBias, ResScale, plain head
    # (reference metaformer.py: norm_layers=GroupNorm1NoBias,
    #  use_mlp_head=False)
    "poolformerv2_s12": dict(depths=(2, 2, 6, 2), dims=_S_DIMS, mixers=_POOL,
                             group_norm=True, use_mlp_head=False),
    "poolformerv2_s24": dict(depths=(4, 4, 12, 4), dims=_S_DIMS,
                             mixers=_POOL, group_norm=True,
                             use_mlp_head=False),
    "poolformerv2_s36": dict(depths=(6, 6, 18, 6), dims=_S_DIMS,
                             mixers=_POOL, group_norm=True,
                             use_mlp_head=False),
    "poolformerv2_m36": dict(depths=(6, 6, 18, 6), dims=_PM_DIMS,
                             mixers=_POOL, group_norm=True,
                             use_mlp_head=False),
    "poolformerv2_m48": dict(depths=(8, 8, 24, 8), dims=_PM_DIMS,
                             mixers=_POOL, group_norm=True,
                             use_mlp_head=False),
    # convformer/caformer: StarReLU, LayerNorm2dNoBias, ResScale, MlpHead
    "convformer_s18": dict(depths=(3, 3, 9, 3), dims=_S_DIMS, mixers=_CONV),
    "convformer_s36": dict(depths=(3, 12, 18, 3), dims=_S_DIMS, mixers=_CONV),
    "convformer_m36": dict(depths=(3, 12, 18, 3), dims=_M_DIMS, mixers=_CONV),
    "convformer_b36": dict(depths=(3, 12, 18, 3), dims=_B_DIMS, mixers=_CONV),
    "caformer_s18": dict(depths=(3, 3, 9, 3), dims=_S_DIMS, mixers=_CA),
    "caformer_s36": dict(depths=(3, 12, 18, 3), dims=_S_DIMS, mixers=_CA),
    "caformer_m36": dict(depths=(3, 12, 18, 3), dims=_M_DIMS, mixers=_CA),
    "caformer_b36": dict(depths=(3, 12, 18, 3), dims=_B_DIMS, mixers=_CA),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _mf(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MetaFormer variant {_name!r} (reference metaformer.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
