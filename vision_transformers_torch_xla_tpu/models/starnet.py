"""StarNet in Flax, NHWC.

Parity with the reference's dormant starnet.py (~350 LoC; SURVEY §2.2):
"star operation" blocks — dw 7x7, two parallel 1x1 expansions whose
elementwise product (relu6(f1) * f2) implicitly maps to a high-dim
feature space, then 1x1 project and a bias-free dw 7x7, residual
(reference starnet.py:48-73). Four stages each opened by a stride-2
ConvBN downsampler.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    with_bn: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups,
                    use_bias=not self.with_bn, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        if self.with_bn:
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="bn")(x)
        return x


class StarNet(nn.Module):
    """Reference starnet.py:75-160 (StarNet)."""

    num_classes: int = 1000
    base_dim: int = 32
    depths: Sequence[int] = (3, 3, 12, 5)
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = _ConvBN(32, 3, 2, name="stem", **p)(x.astype(self.dtype), det)
        x = jnp.minimum(nn.relu(x), 6.0)
        for si, depth in enumerate(self.depths):
            dim = self.base_dim * 2 ** si
            x = _ConvBN(dim, 3, 2, name=f"down_{si}", **p)(x, det)
            for j in range(depth):
                nm = f"s{si}_b{j}"
                y = _ConvBN(dim, 7, groups=dim, name=f"{nm}_dw",
                            **p)(x, det)
                f1 = _ConvBN(dim * self.mlp_ratio, with_bn=False,
                             name=f"{nm}_f1", **p)(y, det)
                f2 = _ConvBN(dim * self.mlp_ratio, with_bn=False,
                             name=f"{nm}_f2", **p)(y, det)
                y = jnp.minimum(nn.relu(f1), 6.0) * f2
                y = _ConvBN(dim, name=f"{nm}_g", **p)(y, det)
                y = _ConvBN(dim, 7, groups=dim, with_bn=False,
                            name=f"{nm}_dw2", **p)(y, det)
                x = x + y
        x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _starnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return StarNet(**merged)

    return build


_VARIANTS = {
    "starnet_s1": dict(base_dim=24, depths=(2, 2, 8, 3)),
    "starnet_s2": dict(base_dim=32, depths=(1, 2, 6, 2)),
    "starnet_s3": dict(base_dim=32, depths=(2, 2, 8, 4)),
    "starnet_s4": dict(base_dim=32, depths=(3, 3, 12, 5)),
    "starnet_s050": dict(base_dim=16, depths=(1, 1, 3, 1), mlp_ratio=3),
    "starnet_s100": dict(base_dim=20, depths=(1, 2, 4, 1), mlp_ratio=4),
    "starnet_s150": dict(base_dim=24, depths=(1, 2, 4, 2), mlp_ratio=3),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _starnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"StarNet variant {_name!r} (reference starnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
