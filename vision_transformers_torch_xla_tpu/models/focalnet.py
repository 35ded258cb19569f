"""FocalNet (Focal Modulation Network) in Flax, NHWC.

Parity with the reference's dormant focalnet.py (719 LoC; SURVEY §2.2):
attention-free hierarchical backbone — each block replaces self-attention
with focal modulation: a 1x1 projection splits into (query, context,
L+1 gates); the context is refined through L successively larger
depthwise convs (kernel 2l + window, GELU after each), gate-weighted and
accumulated, plus a gated global-average level; the query is multiplied
by a 1x1 projection of the aggregated context (reference
focalnet.py:36-102). Large/xlarge variants add post-norm, overlapping
downsamples and LayerScale (reference focalnet.py:627-667).

TPU notes: depthwise convs run as NHWC lax.conv with
feature_group_count=dim (XLA maps them to the VPU; the 1x1 conv
projections are MXU matmuls). All elementwise modulation fuses into the
surrounding ops under XLA.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class FocalModulation(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    focal_factor: int = 2
    use_post_norm: bool = False
    normalize_modulator: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.dim
        L = self.focal_level
        # fused pre-projection -> [q | ctx | gates] (reference :59,77-80)
        t = nn.Dense(2 * c + L + 1, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(
                         trunc_init, ("embed", "qkv_out")),
                     name="f")(x)
        q, ctx, gates = t[..., :c], t[..., c:2 * c], t[..., 2 * c:]

        ctx_all = jnp.zeros_like(ctx)
        for lvl in range(L):
            ks = self.focal_factor * lvl + self.focal_window
            ctx = nn.Conv(c, (ks, ks), feature_group_count=c, padding="SAME",
                          use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"focal_conv_{lvl}")(ctx)
            ctx = nn.gelu(ctx)
            ctx_all = ctx_all + ctx * gates[..., lvl:lvl + 1]
        ctx_global = nn.gelu(jnp.mean(ctx, axis=(1, 2), keepdims=True))
        ctx_all = ctx_all + ctx_global * gates[..., L:L + 1]
        if self.normalize_modulator:
            ctx_all = ctx_all / (L + 1)

        out = q * nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                           name="h")(ctx_all)
        if self.use_post_norm:
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="norm")(out)
        return nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("qkv_out", "embed")),
                        name="proj")(out)


class FocalNetBlock(nn.Module):
    dim: int
    focal_level: int
    focal_window: int
    mlp_ratio: float = 4.0
    use_post_norm: bool = False
    use_post_norm_in_modulation: bool = False
    normalize_modulator: bool = False
    layerscale_value: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _scale(self, x, name):
        if not self.layerscale_value:
            return x
        gamma = self.param(name, nn.initializers.constant(
            self.layerscale_value), (self.dim,), self.param_dtype)
        return x * gamma.astype(x.dtype)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ln = dict(epsilon=1e-5, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        shortcut = x
        y = x if self.use_post_norm else nn.LayerNorm(**ln, name="norm1")(x)
        y = FocalModulation(
            self.dim, self.focal_level, self.focal_window,
            use_post_norm=self.use_post_norm_in_modulation,
            normalize_modulator=self.normalize_modulator,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="modulation")(y)
        if self.use_post_norm:
            y = nn.LayerNorm(**ln, name="norm1")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(self._scale(y, "ls1"), self.drop_path_rate,
                                 deterministic, rng)

        y = x if self.use_post_norm else nn.LayerNorm(**ln, name="norm2")(x)
        y = Mlp(hidden_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp")(y, deterministic)
        if self.use_post_norm:
            y = nn.LayerNorm(**ln, name="norm2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(self._scale(y, "ls2"), self.drop_path_rate,
                             deterministic, rng)


class FocalNet(nn.Module):
    """Reference focalnet.py:318-458 (FocalNet)."""

    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    focal_levels: Sequence[int] = (2, 2, 2, 2)
    focal_windows: Sequence[int] = (3, 3, 3, 3)
    mlp_ratio: float = 4.0
    use_overlap_down: bool = False
    use_post_norm: bool = False
    use_post_norm_in_modulation: bool = False
    normalize_modulator: bool = False
    layerscale_value: float = 0.0
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        dims = [self.embed_dim * (2 ** i) for i in range(len(self.depths))]
        # stem: 4x reduction; overlap variant uses k7 s4 (reference :283-315)
        if self.use_overlap_down:
            x = nn.Conv(dims[0], (7, 7), strides=(4, 4), padding=((3, 3),) * 2,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="stem")(x.astype(self.dtype))
        else:
            x = nn.Conv(dims[0], (4, 4), strides=(4, 4), padding="VALID",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="stem")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="stem_norm")(x)

        total = sum(self.depths)
        done = 0
        for i, depth in enumerate(self.depths):
            if i > 0:
                if self.use_overlap_down:
                    x = nn.Conv(dims[i], (3, 3), strides=(2, 2),
                                padding=((1, 1),) * 2, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"downsample_{i}")(x)
                else:
                    x = nn.Conv(dims[i], (2, 2), strides=(2, 2),
                                padding="VALID", dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"downsample_{i}")(x)
                x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm_{i}")(x)
            for j in range(depth):
                dpr = self.drop_path_rate * (done + j) / max(total - 1, 1)
                x = FocalNetBlock(
                    dims[i], self.focal_levels[i], self.focal_windows[i],
                    mlp_ratio=self.mlp_ratio,
                    use_post_norm=self.use_post_norm,
                    use_post_norm_in_modulation=self.use_post_norm_in_modulation,
                    normalize_modulator=self.normalize_modulator,
                    layerscale_value=self.layerscale_value,
                    drop_path_rate=dpr, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{i}_{j}")(x, deterministic)
            done += depth

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _focalnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return FocalNet(**merged)

    return build


_LARGE = dict(use_post_norm=True, use_overlap_down=True,
              layerscale_value=1e-4)
_VARIANTS = {
    "focalnet_tiny_srf": dict(depths=(2, 2, 6, 2), embed_dim=96),
    "focalnet_small_srf": dict(depths=(2, 2, 18, 2), embed_dim=96),
    "focalnet_base_srf": dict(depths=(2, 2, 18, 2), embed_dim=128),
    "focalnet_tiny_lrf": dict(depths=(2, 2, 6, 2), embed_dim=96,
                              focal_levels=(3, 3, 3, 3)),
    "focalnet_small_lrf": dict(depths=(2, 2, 18, 2), embed_dim=96,
                               focal_levels=(3, 3, 3, 3)),
    "focalnet_base_lrf": dict(depths=(2, 2, 18, 2), embed_dim=128,
                              focal_levels=(3, 3, 3, 3)),
    "focalnet_large_fl3": dict(depths=(2, 2, 18, 2), embed_dim=192,
                               focal_levels=(3, 3, 3, 3),
                               focal_windows=(5, 5, 5, 5), **_LARGE),
    "focalnet_large_fl4": dict(depths=(2, 2, 18, 2), embed_dim=192,
                               focal_levels=(4, 4, 4, 4), **_LARGE),
    "focalnet_xlarge_fl3": dict(depths=(2, 2, 18, 2), embed_dim=256,
                                focal_levels=(3, 3, 3, 3),
                                focal_windows=(5, 5, 5, 5), **_LARGE),
    "focalnet_xlarge_fl4": dict(depths=(2, 2, 18, 2), embed_dim=256,
                                focal_levels=(4, 4, 4, 4), **_LARGE),
    "focalnet_huge_fl3": dict(depths=(2, 2, 18, 2), embed_dim=352,
                              focal_levels=(3, 3, 3, 3),
                              focal_windows=(5, 5, 5, 5),
                              use_post_norm_in_modulation=True, **_LARGE),
    "focalnet_huge_fl4": dict(depths=(2, 2, 18, 2), embed_dim=352,
                              focal_levels=(4, 4, 4, 4),
                              use_post_norm_in_modulation=True, **_LARGE),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _focalnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"FocalNet variant {_name!r} (reference focalnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
