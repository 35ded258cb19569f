"""ConvNeXt in Flax, TPU-first.

Capability parity with the reference's vendored convnext.py (1336 LoC,
dormant but one of only two families its CLI accepts — reference
main.py:633-651 gates names to vit*/convnext*; layer-decay support in
optim_factory.py:29-57 exists specifically for ConvNeXt).

TPU design notes:
  * NHWC throughout (TPU-native conv layout).
  * 4x4/stride-4 stem and 2x2/stride-2 downsamples are expressed as
    space-to-depth reshapes + matmul — identical math, lands on the MXU
    without conv lowering.
  * 7x7 depthwise conv stays `lax.conv` with feature_group_count=C (XLA has
    a dedicated depthwise path); everything else is matmul/VPU.
  * channels-last LayerNorm, GELU, LayerScale; stochastic depth per sample.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path, trunc_init
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        shortcut = x
        # 7x7 depthwise conv (NHWC)
        x = nn.Conv(self.dim, (7, 7), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    kernel_init=nn.with_logical_partitioning(trunc_init, (None, None, None, "embed")),
                    name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(trunc_init, ("embed", "mlp")),
                     name="pwconv1")(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(trunc_init, ("mlp", "embed")),
                     name="pwconv2")(x)
        if self.layer_scale_init > 0:
            gamma = self.param(
                "gamma",
                nn.with_logical_partitioning(
                    nn.initializers.constant(self.layer_scale_init), ("embed",)),
                (self.dim,), self.param_dtype)
            x = x * gamma.astype(x.dtype)
        rng = None if deterministic or self.drop_path_rate == 0.0 else \
            self.make_rng("droppath")
        return shortcut + drop_path(x, self.drop_path_rate, deterministic, rng)


def _space_to_depth(x: jax.Array, p: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    head_init_scale: float = 1.0
    img_size: int = 224  # accepted for factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dp_rates = jnp.linspace(0, self.drop_path_rate, sum(self.depths))
        # stem: 4x4 stride 4 -> space-to-depth + matmul
        x = _space_to_depth(x.astype(self.dtype), 4)
        x = nn.Dense(self.dims[0], dtype=self.dtype, param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(trunc_init, ("patch", "embed")),
                     name="stem_proj")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="stem_norm")(x)
        cur = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm_{stage}")(x)
                x = _space_to_depth(x, 2)
                x = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                             kernel_init=nn.with_logical_partitioning(trunc_init, ("patch", "embed")),
                             name=f"downsample_proj_{stage}")(x)
            for blk in range(depth):
                x = ConvNeXtBlock(
                    dim=dim, drop_path_rate=float(dp_rates[cur + blk]),
                    layer_scale_init=self.layer_scale_init, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stages_{stage}_blocks_{blk}")(x, deterministic)
            cur += depth
        x = x.mean(axis=(1, 2))  # global avg pool (NHWC)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.truncated_normal(0.02 * self.head_init_scale),
                ("embed", "classes")),
            name="head")(x)
        return logits.astype(jnp.float32)


def _convnext(depths, dims, **kwargs):
    kwargs.pop("pretrained_tag", None)
    kwargs.pop("global_pool", None)   # always avg-pooled
    kwargs.pop("remat", None)         # TODO: stage-level remat
    if "init_values" in kwargs:       # ViT-style alias from the factory/CLI
        kwargs["layer_scale_init"] = kwargs.pop("init_values") or 1e-6
    return ConvNeXt(depths=depths, dims=dims, **kwargs)


@register_model
def convnext_atto(**kw):
    return _convnext((2, 2, 6, 2), (40, 80, 160, 320), **kw)


@register_model
def convnext_femto(**kw):
    return _convnext((2, 2, 6, 2), (48, 96, 192, 384), **kw)


@register_model
def convnext_pico(**kw):
    return _convnext((2, 2, 6, 2), (64, 128, 256, 512), **kw)


@register_model
def convnext_nano(**kw):
    return _convnext((2, 2, 8, 2), (80, 160, 320, 640), **kw)


@register_model
def convnext_tiny(**kw):
    return _convnext((3, 3, 9, 3), (96, 192, 384, 768), **kw)


@register_model
def convnext_small(**kw):
    return _convnext((3, 3, 27, 3), (96, 192, 384, 768), **kw)


@register_model
def convnext_base(**kw):
    return _convnext((3, 3, 27, 3), (128, 256, 512, 1024), **kw)


@register_model
def convnext_large(**kw):
    return _convnext((3, 3, 27, 3), (192, 384, 768, 1536), **kw)


@register_model
def convnext_xlarge(**kw):
    return _convnext((3, 3, 27, 3), (256, 512, 1024, 2048), **kw)
