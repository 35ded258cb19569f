"""RepViT in Flax, NHWC (train-time multi-branch form).

Parity with the reference's dormant repvit.py (~600 LoC; SURVEY §2.2):
MetaFormer-style pure-conv blocks — RepVggDw token mixer (dw 3x3 + dw
1x1 + identity, summed, BN) with alternating SE, 1x1 conv-BN channel
MLP (second conv BN weight zero-init), dual-block downsample stages,
two-conv stem, BN+Linear distillation head averaged at inference
(reference repvit.py:86-256).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ConvNorm(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    bn_weight_init: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-5,
                            scale_init=nn.initializers.constant(
                                self.bn_weight_init),
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class _RepVggDw(nn.Module):
    kernel: int = 3
    legacy: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = _ConvNorm(c, self.kernel, groups=c, name="conv",
                      **p)(x, deterministic)
        if self.legacy:
            y = y + _ConvNorm(c, 1, groups=c, name="conv1",
                              **p)(x, deterministic) + x
            return y
        y = y + nn.Conv(c, (1, 1), feature_group_count=c, name="conv1",
                        **p)(x) + x
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(y)


class _Mlp(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = _ConvNorm(self.hidden, name="conv1", **p)(x, deterministic)
        y = nn.gelu(y)
        return _ConvNorm(c, bn_weight_init=0.0, name="conv2",
                         **p)(y, deterministic)


class _Block(nn.Module):
    use_se: bool
    mlp_ratio: int = 2
    legacy: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = _RepVggDw(3, self.legacy, name="token_mixer",
                      **p)(x, deterministic)
        if self.use_se:
            s = jnp.mean(x, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(c // 4, (1, 1), name="se_reduce", **p)(s))
            s = nn.Conv(c, (1, 1), name="se_expand", **p)(s)
            x = x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x + _Mlp(c * self.mlp_ratio, name="channel_mixer",
                        **p)(x, deterministic)


class RepVit(nn.Module):
    """Reference repvit.py:257-400 (RepVit)."""

    num_classes: int = 1000
    embed_dim: Sequence[int] = (48, 96, 192, 384)
    depth: Sequence[int] = (2, 2, 14, 2)
    mlp_ratio: int = 2
    legacy: bool = False
    distillation: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d0 = self.embed_dim[0]
        x = _ConvNorm(d0 // 2, 3, 2, name="stem_conv1",
                      **p)(x.astype(self.dtype), det)
        x = nn.gelu(x)
        x = _ConvNorm(d0, 3, 2, name="stem_conv2", **p)(x, det)

        for si, dim in enumerate(self.embed_dim):
            if si > 0:
                prev = self.embed_dim[si - 1]
                x = _Block(False, self.mlp_ratio, self.legacy,
                           name=f"down{si}_pre", **p)(x, det)
                x = _ConvNorm(prev, 3, 2, groups=prev,
                              name=f"down{si}_spatial", **p)(x, det)
                x = _ConvNorm(dim, 1, name=f"down{si}_channel",
                              **p)(x, det)
                x = x + _Mlp(dim * self.mlp_ratio, name=f"down{si}_ffn",
                             **p)(x, det)
            use_se = True
            for j in range(self.depth[si]):
                x = _Block(use_se, self.mlp_ratio, self.legacy,
                           name=f"s{si}_b{j}", **p)(x, det)
                use_se = not use_se

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        # NormLinear head(s): BN1d + Linear (reference repvit.py:61-84)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=det, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        logits = nn.Dense(self.num_classes, name="head",
                          **p)(bn("head_bn")(x)).astype(jnp.float32)
        if not self.distillation:
            return logits
        dist = nn.Dense(self.num_classes, name="head_dist",
                        **p)(bn("head_dist_bn")(x)).astype(jnp.float32)
        return (logits + dist) / 2


def _repvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return RepVit(**merged)

    return build


_VARIANTS = {
    "repvit_m1": dict(embed_dim=(48, 96, 192, 384), depth=(2, 2, 14, 2),
                      legacy=True),
    "repvit_m2": dict(embed_dim=(64, 128, 256, 512), depth=(2, 2, 12, 2),
                      legacy=True),
    "repvit_m3": dict(embed_dim=(64, 128, 256, 512), depth=(4, 4, 18, 2),
                      legacy=True),
    "repvit_m0_9": dict(embed_dim=(48, 96, 192, 384), depth=(2, 2, 14, 2)),
    "repvit_m1_0": dict(embed_dim=(56, 112, 224, 448),
                        depth=(2, 2, 14, 2)),
    "repvit_m1_1": dict(embed_dim=(64, 128, 256, 512),
                        depth=(2, 2, 12, 2)),
    "repvit_m1_5": dict(embed_dim=(64, 128, 256, 512),
                        depth=(4, 4, 24, 4)),
    "repvit_m2_3": dict(embed_dim=(80, 160, 320, 640),
                        depth=(6, 6, 34, 2)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _repvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"RepViT variant {_name!r} (reference repvit.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
