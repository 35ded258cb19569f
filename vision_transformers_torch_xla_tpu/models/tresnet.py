"""TResNet in Flax, NHWC.

Parity with the reference's dormant tresnet.py (409 LoC; SURVEY §2.2):
SpaceToDepth 4x4 stem, leaky-ReLU conv-BN blocks, SE in the early
stages, anti-aliased stride-2 (conv at stride 1 followed by a fixed
binomial blur-pool downsample), avg-pool + 1x1 shortcut projections
(reference tresnet.py:24-160). v2 uses bottlenecks in every stage.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _blur_pool(x):
    """Fixed 3x3 binomial depthwise filter at stride 2 (BlurPool2d)."""
    c = x.shape[-1]
    f = np.array([1.0, 2.0, 1.0])
    k = np.outer(f, f)
    k = k / k.sum()
    kern = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)), x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class _ConvBnAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    aa: bool = False                   # anti-aliased stride 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        stride = 1 if (self.aa and self.stride == 2) else self.stride
        x = nn.Conv(self.features, (k, k), strides=(stride, stride),
                    padding=((k // 2, k // 2),) * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        if self.act:
            x = nn.leaky_relu(x, 1e-3)
        if self.aa and self.stride == 2:
            x = _blur_pool(x)
        return x


def _se(x, rd, name, parent_p):
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = nn.relu(nn.Conv(rd, (1, 1), name=f"{name}_r", **parent_p)(s))
    s = nn.Conv(x.shape[-1], (1, 1), name=f"{name}_e", **parent_p)(s)
    return x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class TResNet(nn.Module):
    """Reference tresnet.py:112-280 (TResNet)."""

    num_classes: int = 1000
    layers: Sequence[int] = (3, 4, 11, 3)
    width_factor: float = 1.0
    v2: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        planes = int(64 * self.width_factor)
        if self.v2:
            planes = planes // 8 * 8

        # SpaceToDepth 4x4: (B, H, W, 3) -> (B, H/4, W/4, 48)
        b, hh, ww, c = x.shape
        x = x.astype(self.dtype).reshape(b, hh // 4, 4, ww // 4, 4, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 4, ww // 4,
                                                  16 * c)
        x = _ConvBnAct(planes, 3, name="conv1", **p)(x, det)

        for si, depth in enumerate(self.layers):
            stride = 1 if si == 0 else 2
            use_se = si < 3 if not self.v2 else si < 3
            bottleneck = self.v2 or si >= 2
            width = planes * (2 ** si)
            out = width * (4 if bottleneck else 1)
            for bi in range(depth):
                s = stride if bi == 0 else 1
                nm = f"s{si}_b{bi}"
                shortcut = x
                if x.shape[-1] != out or s > 1:
                    if s > 1:
                        shortcut = nn.avg_pool(shortcut, (2, 2),
                                               strides=(2, 2))
                    shortcut = _ConvBnAct(out, 1, act=False,
                                          name=f"{nm}_down",
                                          **p)(shortcut, det)
                if bottleneck:
                    y = _ConvBnAct(width, 1, name=f"{nm}_c1", **p)(x, det)
                    y = _ConvBnAct(width, 3, s, aa=True, name=f"{nm}_c2",
                                   **p)(y, det)
                    if use_se and si < 3:
                        y = _se(y, max(out // 8, 64), f"{nm}_se", p)
                    y = _ConvBnAct(out, 1, act=False, name=f"{nm}_c3",
                                   **p)(y, det)
                else:
                    y = _ConvBnAct(width, 3, s, aa=True, name=f"{nm}_c1",
                                   **p)(x, det)
                    y = _ConvBnAct(width, 3, act=False, name=f"{nm}_c2",
                                   **p)(y, det)
                    if use_se:
                        y = _se(y, max(width // 4, 64), f"{nm}_se", p)
                x = nn.relu(y + shortcut)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _tresnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return TResNet(**merged)

    return build


_VARIANTS = {
    "tresnet_m": dict(layers=(3, 4, 11, 3)),
    "tresnet_l": dict(layers=(4, 5, 18, 3), width_factor=1.2),
    "tresnet_xl": dict(layers=(4, 5, 24, 3), width_factor=1.3),
    "tresnet_v2_l": dict(layers=(3, 4, 23, 3), v2=True),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _tresnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"TResNet variant {_name!r} (reference tresnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
