"""ResNetV2 / BiT (Big Transfer) in Flax, NHWC.

Parity with the reference's dormant resnetv2.py (1163 LoC; SURVEY §2.2):
pre-activation bottlenecks (norm-act before each conv, projection taken
from the pre-activated input) with the BiT recipe — weight-standardized
convs + GroupNorm(32) — for the *_bit variants (reference
resnetv2.py:138-234), and conv+BatchNorm pre-act for the plain
resnetv2_50/101/152 names. Width-factor scaling for BiT transfer
models.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class StdConv(nn.Module):
    """Weight-standardized conv (BiT): kernel is normalized over
    (kh, kw, in) before the convolution."""

    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        w = self.param("kernel", nn.initializers.he_normal(),
                       (k, k, x.shape[-1], self.features),
                       self.param_dtype)
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-8)
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride),
            ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class _FRN(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.param("scale", nn.initializers.ones, (c,),
                       self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (c,),
                       self.param_dtype)
        tau = self.param("tau", nn.initializers.zeros, (c,),
                         self.param_dtype)
        nu2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                       keepdims=True)
        y = x.astype(jnp.float32) / jnp.sqrt(nu2 + 1e-6)
        y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
        return jnp.maximum(y, tau.astype(jnp.float32)).astype(x.dtype)


class _PreActBottleneck(nn.Module):
    out_chs: int
    stride: int = 1
    bottle_ratio: float = 0.25
    bit: bool = True                   # StdConv+GN vs Conv+BN
    basic: bool = False                # 18/34: two 3x3 convs
    norm: str = "bn"                   # non-bit norm kind
    avg_down: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = int(self.out_chs * self.bottle_ratio)
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def norm_act(y, name):
            if self.bit:
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5, **p,
                                 name=name)(y)
            elif self.norm == "gn":
                y = nn.GroupNorm(num_groups=32, epsilon=1e-5, **p,
                                 name=name)(y)
            elif self.norm == "evos":
                from vision_transformers_torch_xla_tpu.models. \
                    effnet_builder import _Norm
                return _Norm(kind="evos", group_size=8, eps=1e-5,
                             deterministic=deterministic, name=name,
                             **p)(y)
            elif self.norm == "frn":
                return _FRN(name=name, **p)(y)
            else:
                y = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5, **p,
                                 name=name)(y)
            return nn.relu(y)

        def conv(y, feats, k, s, name):
            if self.bit:
                return StdConv(feats, k, s, **p, name=name)(y)
            return nn.Conv(feats, (k, k), strides=(s, s),
                           padding=((k // 2, k // 2),) * 2,
                           use_bias=False, **p, name=name)(y)

        pre = norm_act(x, "norm1")
        if x.shape[-1] != self.out_chs or self.stride > 1:
            s = pre
            if self.avg_down and self.stride > 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
                shortcut = conv(s, self.out_chs, 1, 1, "downsample")
            else:
                shortcut = conv(s, self.out_chs, 1, self.stride,
                                "downsample")
        else:
            shortcut = x
        if self.basic:
            y = conv(pre, self.out_chs, 3, self.stride, "conv1")
            y = conv(norm_act(y, "norm2"), self.out_chs, 3, 1, "conv2")
        else:
            y = conv(pre, mid, 1, 1, "conv1")
            y = conv(norm_act(y, "norm2"), mid, 3, self.stride, "conv2")
            y = conv(norm_act(y, "norm3"), self.out_chs, 1, 1, "conv3")
        return y + shortcut


class ResNetV2(nn.Module):
    """Reference resnetv2.py:505-700 (ResNetV2)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 6, 3)
    width_factor: int = 1
    bit: bool = True
    basic: bool = False
    norm: str = "bn"
    avg_down: bool = False
    stem_type: str = ""        # ''|'fixed'|'deep'|'deep_tiered'
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        wf = self.width_factor
        stem = 64 * wf
        x = x.astype(self.dtype)
        if self.bit:
            x = StdConv(stem, 7, 2, **p, name="stem_conv")(x)
        elif self.stem_type.startswith("deep"):
            plan = ((24, 32, 64) if self.stem_type == "deep_tiered"
                    else (32, 32, 64))
            for i, ch in enumerate(plan):
                x = nn.Conv(ch, (3, 3), strides=2 if i == 0 else 1,
                            padding=((1, 1), (1, 1)), use_bias=False,
                            **p, name=f"stem_conv{i}")(x)
                if i < len(plan) - 1:
                    # pre-act net: norm+act between stem convs only
                    x = nn.relu(nn.BatchNorm(use_running_average=det,
                                             momentum=0.9, epsilon=1e-5,
                                             **p,
                                             name=f"stem_norm{i}")(x))
        else:
            x = nn.Conv(stem, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)), use_bias=False, **p,
                        name="stem_conv")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for si, depth in enumerate(self.layers):
            base = 64 if self.basic else 256
            out = base * (2 ** si) * wf
            for bi in range(depth):
                x = _PreActBottleneck(
                    out, stride=2 if si > 0 and bi == 0 else 1,
                    bit=self.bit, basic=self.basic, norm=self.norm,
                    avg_down=self.avg_down, **p,
                    name=f"stages_{si}_blocks_{bi}")(x, det)
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)

        if self.bit or self.norm == "gn":
            x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, **p,
                                     name="norm")(x))
        elif self.norm == "frn":
            x = _FRN(name="norm", **p)(x)
        elif self.norm == "evos":
            from vision_transformers_torch_xla_tpu.models. \
                effnet_builder import _Norm
            x = _Norm(kind="evos", group_size=8, eps=1e-5,
                      deterministic=det, name="norm", **p)(x)
        else:
            x = nn.relu(nn.BatchNorm(use_running_average=det,
                                     momentum=0.9, epsilon=1e-5, **p,
                                     name="norm")(x))
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, **p,
                        name="head")(x).astype(jnp.float32)


def _resnetv2(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size", "drop_path_rate"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return ResNetV2(**merged)

    return build


_VARIANTS = {
    "resnetv2_50x1_bit": dict(layers=(3, 4, 6, 3), width_factor=1),
    "resnetv2_50x3_bit": dict(layers=(3, 4, 6, 3), width_factor=3),
    "resnetv2_101x1_bit": dict(layers=(3, 4, 23, 3), width_factor=1),
    "resnetv2_101x3_bit": dict(layers=(3, 4, 23, 3), width_factor=3),
    "resnetv2_152x2_bit": dict(layers=(3, 8, 36, 3), width_factor=2),
    "resnetv2_152x4_bit": dict(layers=(3, 8, 36, 3), width_factor=4),
    "resnetv2_50": dict(layers=(3, 4, 6, 3), bit=False),
    "resnetv2_101": dict(layers=(3, 4, 23, 3), bit=False),
    "resnetv2_152": dict(layers=(3, 8, 36, 3), bit=False),
    # reference resnetv2.py non-BiT additions
    "resnetv2_18": dict(layers=(2, 2, 2, 2), bit=False, basic=True),
    "resnetv2_18d": dict(layers=(2, 2, 2, 2), bit=False, basic=True,
                         stem_type="deep", avg_down=True),
    "resnetv2_34": dict(layers=(3, 4, 6, 3), bit=False, basic=True),
    "resnetv2_34d": dict(layers=(3, 4, 6, 3), bit=False, basic=True,
                         stem_type="deep", avg_down=True),
    "resnetv2_50d": dict(layers=(3, 4, 6, 3), bit=False,
                         stem_type="deep", avg_down=True),
    "resnetv2_50t": dict(layers=(3, 4, 6, 3), bit=False,
                         stem_type="deep_tiered", avg_down=True),
    "resnetv2_101d": dict(layers=(3, 4, 23, 3), bit=False,
                          stem_type="deep", avg_down=True),
    "resnetv2_152d": dict(layers=(3, 8, 36, 3), bit=False,
                          stem_type="deep", avg_down=True),
    "resnetv2_50d_gn": dict(layers=(3, 4, 6, 3), bit=False, norm="gn",
                            stem_type="deep", avg_down=True),
    "resnetv2_50d_evos": dict(layers=(3, 4, 6, 3), bit=False,
                              norm="evos", stem_type="deep",
                              avg_down=True),
    "resnetv2_50d_frn": dict(layers=(3, 4, 6, 3), bit=False, norm="frn",
                             stem_type="deep", avg_down=True),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _resnetv2(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"ResNetV2/BiT variant {_name!r} (reference resnetv2.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
