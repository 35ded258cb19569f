"""DPN (Dual Path Networks) in Flax, NHWC.

Parity with the reference's dormant dpn.py (371 LoC; SURVEY §2.2): each
block keeps a residual path (fixed width, summed) and a dense path
(growing `inc` channels, concatenated) — BN-ReLU-conv bottlenecks with
grouped 3x3, projection blocks at stage starts (reference
dpn.py:56-147). 'b' variants split the final 1x1 into two convs after
a concat-BN-act.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _BnActConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        x = nn.relu(x)
        k = self.kernel
        return nn.Conv(self.features, (k, k),
                       strides=(self.stride, self.stride),
                       padding=((k // 2, k // 2),) * 2,
                       feature_group_count=self.groups, use_bias=False,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class DPN(nn.Module):
    """Reference dpn.py:165-280 (DPN)."""

    num_classes: int = 1000
    k_sec: Sequence[int] = (3, 4, 20, 3)
    inc_sec: Sequence[int] = (16, 32, 24, 128)
    k_r: int = 96
    groups: int = 32
    num_init_features: int = 64
    small: bool = False
    b: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bwf = 1 if self.small else 4
        k = 3 if self.small else 7
        x = nn.Conv(self.num_init_features, (k, k), strides=(2, 2),
                    padding=((k // 2, k // 2),) * 2, use_bias=False,
                    name="conv1", **p)(x.astype(self.dtype))
        x = nn.relu(nn.BatchNorm(use_running_average=det, momentum=0.9,
                                 epsilon=1e-3, name="conv1_bn",
                                 **p)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        resid, dense = None, None
        for si, depth in enumerate(self.k_sec):
            bw = 64 * (2 ** si) * bwf
            inc = self.inc_sec[si]
            r = (self.k_r * bw) // (64 * bwf)
            for bi in range(depth):
                nm = f"s{si}_b{bi}"
                if bi == 0:
                    x_in = x if si == 0 else jnp.concatenate(
                        [resid, dense], axis=-1)
                    stride = 1 if si == 0 else 2
                    xs = _BnActConv(bw + 2 * inc, 1, stride,
                                    name=f"{nm}_proj", **p)(x_in, det)
                    x_s1, x_s2 = xs[..., :bw], xs[..., bw:]
                else:
                    x_in = jnp.concatenate([resid, dense], axis=-1)
                    stride = 1
                    x_s1, x_s2 = resid, dense
                y = _BnActConv(r, 1, name=f"{nm}_a", **p)(x_in, det)
                y = _BnActConv(r, 3, stride, self.groups,
                               name=f"{nm}_bx", **p)(y, det)
                if self.b:
                    y = nn.relu(nn.BatchNorm(
                        use_running_average=det, momentum=0.9,
                        epsilon=1e-3, name=f"{nm}_cbn", **p)(y))
                    out1 = nn.Conv(bw, (1, 1), use_bias=False,
                                   name=f"{nm}_c1", **p)(y)
                    out2 = nn.Conv(inc, (1, 1), use_bias=False,
                                   name=f"{nm}_c2", **p)(y)
                else:
                    y = _BnActConv(bw + inc, 1, name=f"{nm}_c",
                                   **p)(y, det)
                    out1, out2 = y[..., :bw], y[..., bw:]
                resid = x_s1 + out1
                dense = jnp.concatenate([x_s2, out2], axis=-1)

        x = jnp.concatenate([resid, dense], axis=-1)
        x = nn.relu(nn.BatchNorm(use_running_average=det, momentum=0.9,
                                 epsilon=1e-3, name="final_bn", **p)(x))
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _dpn(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return DPN(**merged)

    return build


_VARIANTS = {
    "dpn68": dict(small=True, num_init_features=10, k_r=128, groups=32,
                  k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64)),
    "dpn68b": dict(small=True, num_init_features=10, k_r=128, groups=32,
                   b=True, k_sec=(3, 4, 12, 3), inc_sec=(16, 32, 32, 64)),
    "dpn48b": dict(small=True, num_init_features=10, k_r=128, groups=32,
                   b=True, k_sec=(3, 4, 6, 3), inc_sec=(16, 32, 32, 64)),
    "dpn92": dict(num_init_features=64, k_r=96, groups=32,
                  k_sec=(3, 4, 20, 3), inc_sec=(16, 32, 24, 128)),
    "dpn98": dict(num_init_features=96, k_r=160, groups=40,
                  k_sec=(3, 6, 20, 3), inc_sec=(16, 32, 32, 128)),
    "dpn131": dict(num_init_features=128, k_r=160, groups=40,
                   k_sec=(4, 8, 28, 3), inc_sec=(16, 32, 32, 128)),
    "dpn107": dict(num_init_features=128, k_r=200, groups=50,
                   k_sec=(4, 8, 20, 3), inc_sec=(20, 64, 64, 128)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _dpn(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"DPN variant {_name!r} (reference dpn.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
