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
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path, trunc_init
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _cnx_norm(kind, dtype, param_dtype, name, eps=1e-6):
    """LayerNorm (default) or RMS/SimpleNorm (reference 'rmsnorm2d' /
    'simplenorm' norm_layer options)."""
    if kind in ("rms", "simple"):
        return nn.RMSNorm(epsilon=eps, dtype=dtype,
                          param_dtype=param_dtype, name=name)
    return nn.LayerNorm(epsilon=eps, dtype=dtype, param_dtype=param_dtype,
                        name=name)


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    mlp_ratio: int = 4
    kernel_size: int = 7
    use_grn: bool = False
    norm_kind: str = "ln"
    norm_eps: float = 1e-6
    act: str = "gelu"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        shortcut = x
        k = self.kernel_size
        x = nn.Conv(self.dim, (k, k), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    kernel_init=nn.with_logical_partitioning(trunc_init, (None, None, None, "embed")),
                    name="dwconv")(x)
        x = _cnx_norm(self.norm_kind, self.dtype, self.param_dtype, "norm",
                      self.norm_eps)(x)
        x = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     kernel_init=nn.with_logical_partitioning(trunc_init, ("embed", "mlp")),
                     name="pwconv1")(x)
        if self.act == "silu":
            x = nn.silu(x)
        else:
            x = nn.gelu(x, approximate=self.act == "gelu_tanh")
        if self.use_grn:
            # ConvNeXt-V2 Global Response Normalization (reference
            # convnext.py v2 blocks): spatial L2 energy per channel,
            # normalized by its channel mean, learned scale+shift residual
            mid = x.shape[-1]
            gamma = self.param("grn_gamma", nn.initializers.zeros,
                               (mid,), self.param_dtype)
            beta = self.param("grn_beta", nn.initializers.zeros,
                              (mid,), self.param_dtype)
            gx = jnp.sqrt(
                jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                        keepdims=True) + 1e-12)
            nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
            x = x + (gamma.astype(jnp.float32) * (x.astype(jnp.float32)
                     * nx) + beta.astype(jnp.float32)).astype(x.dtype)
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
    use_grn: bool = False
    stem_type: str = "patch"   # 'patch'|'overlap'|'overlap_tiered'|'overlap_act'
    kernel_sizes: Optional[Tuple[int, ...]] = None
    norm_kind: str = "ln"      # 'ln' | 'rms' | 'simple'
    norm_eps: float = 1e-6
    act: str = "gelu"
    head_norm_first: bool = False
    head_hidden_size: Optional[int] = None
    img_size: int = 224  # accepted for factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dp_rates = np.linspace(0, self.drop_path_rate, sum(self.depths))
        x = x.astype(self.dtype)
        if self.stem_type == "patch":
            # stem: 4x4 stride 4 -> space-to-depth + matmul
            x = _space_to_depth(x, 4)
            x = nn.Dense(self.dims[0], dtype=self.dtype, param_dtype=self.param_dtype,
                         kernel_init=nn.with_logical_partitioning(trunc_init, ("patch", "embed")),
                         name="stem_proj")(x)
        else:
            # overlapping 3x3/s2 conv pair (reference convnext.py:361-376)
            mid = self.dims[0] // 2 if "tiered" in self.stem_type \
                else self.dims[0]
            mid = max(8, (mid + 4) // 8 * 8)
            x = nn.Conv(mid, (3, 3), strides=2, padding="SAME",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="stem_conv1")(x)
            if "act" in self.stem_type:
                x = nn.gelu(x, approximate=True)
            x = nn.Conv(self.dims[0], (3, 3), strides=2, padding="SAME",
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="stem_conv2")(x)
        x = _cnx_norm(self.norm_kind, self.dtype, self.param_dtype,
                      "stem_norm", self.norm_eps)(x)
        cur = 0
        for stage, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if stage > 0:
                x = _cnx_norm(self.norm_kind, self.dtype, self.param_dtype,
                              f"downsample_norm_{stage}", self.norm_eps)(x)
                x = _space_to_depth(x, 2)
                x = nn.Dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                             kernel_init=nn.with_logical_partitioning(trunc_init, ("patch", "embed")),
                             name=f"downsample_proj_{stage}")(x)
            for blk in range(depth):
                ks = self.kernel_sizes[stage] if self.kernel_sizes else 7
                x = ConvNeXtBlock(
                    dim=dim, drop_path_rate=float(dp_rates[cur + blk]),
                    layer_scale_init=self.layer_scale_init,
                    kernel_size=ks, use_grn=self.use_grn,
                    norm_kind=self.norm_kind, norm_eps=self.norm_eps,
                    act=self.act, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"stages_{stage}_blocks_{blk}")(x, deterministic)
            cur += depth
            # stage-boundary feature tap (models/features.py; parity with
            # reference _features.py FeatureInfo out_indices)
            self.sow("intermediates", f"stage_{stage}", x)
        if self.head_norm_first:
            x = _cnx_norm(self.norm_kind, self.dtype, self.param_dtype,
                          "norm", self.norm_eps)(x)
            x = x.mean(axis=(1, 2))
        else:
            x = x.mean(axis=(1, 2))  # global avg pool (NHWC)
            x = _cnx_norm(self.norm_kind, self.dtype, self.param_dtype,
                          "norm", self.norm_eps)(x)
        if self.head_hidden_size:
            x = nn.Dense(self.head_hidden_size, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="head_pre_logits")(x)
            x = nn.gelu(x, approximate=True)
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


def _reg(name, depths, dims, **cfg):
    def build(**kw):
        merged = dict(cfg)
        merged.update(kw)
        d = merged.pop("depths", depths)
        c = merged.pop("dims", dims)
        return _convnext(d, c, **merged)

    build.__name__ = name
    build.__qualname__ = name
    build.__doc__ = (f"ConvNeXt variant {name!r} (reference convnext.py "
                     f"registry surface).")
    import sys as _sys
    setattr(_sys.modules[__name__], name, register_model(build))


# timm experimental stems / norms / heads (reference convnext.py:1085-1250)
_reg("convnext_zepto_rms", (2, 2, 4, 2), (32, 64, 128, 256),
     norm_kind="simple")
_reg("convnext_zepto_rms_ols", (2, 2, 4, 2), (32, 64, 128, 256),
     norm_kind="simple", stem_type="overlap_act")
_reg("convnext_atto_ols", (2, 2, 6, 2), (40, 80, 160, 320),
     stem_type="overlap_tiered")
_reg("convnext_atto_rms", (2, 2, 6, 2), (40, 80, 160, 320),
     norm_kind="rms")
_reg("convnext_femto_ols", (2, 2, 6, 2), (48, 96, 192, 384),
     stem_type="overlap_tiered")
_reg("convnext_pico_ols", (2, 2, 6, 2), (64, 128, 256, 512),
     stem_type="overlap_tiered")
_reg("convnext_nano_ols", (2, 2, 8, 2), (80, 160, 320, 640),
     stem_type="overlap")
_reg("convnext_tiny_hnf", (3, 3, 9, 3), (96, 192, 384, 768),
     head_norm_first=True)
_reg("convnext_large_mlp", (3, 3, 27, 3), (192, 384, 768, 1536),
     head_hidden_size=1536)
_reg("convnext_xxlarge", (3, 4, 30, 3), (384, 768, 1536, 3072),
     norm_eps=1e-5)
# ConvNeXt-V2: GRN in the MLP, no layer scale (reference v2 registrations)
_V2 = dict(use_grn=True, layer_scale_init=0.0)
_reg("convnextv2_atto", (2, 2, 6, 2), (40, 80, 160, 320), **_V2)
_reg("convnextv2_femto", (2, 2, 6, 2), (48, 96, 192, 384), **_V2)
_reg("convnextv2_pico", (2, 2, 6, 2), (64, 128, 256, 512), **_V2)
_reg("convnextv2_nano", (2, 2, 8, 2), (80, 160, 320, 640), **_V2)
_reg("convnextv2_tiny", (3, 3, 9, 3), (96, 192, 384, 768), **_V2)
_reg("convnextv2_small", (3, 3, 27, 3), (96, 192, 384, 768), **_V2)
_reg("convnextv2_base", (3, 3, 27, 3), (128, 256, 512, 1024), **_V2)
_reg("convnextv2_large", (3, 3, 27, 3), (192, 384, 768, 1536), **_V2)
_reg("convnextv2_huge", (3, 3, 27, 3), (352, 704, 1408, 2816), **_V2)
_reg("test_convnext", (1, 2, 4, 2), (24, 32, 48, 64), norm_eps=1e-5,
     act="gelu_tanh")
_reg("test_convnext2", (1, 1, 1, 1), (32, 64, 96, 128), norm_eps=1e-5,
     act="gelu_tanh")
_reg("test_convnext3", (1, 1, 1, 1), (32, 64, 96, 128), norm_eps=1e-5,
     kernel_sizes=(7, 5, 5, 3), act="silu")


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
