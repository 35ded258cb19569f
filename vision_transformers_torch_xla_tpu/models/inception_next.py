"""InceptionNeXt in Flax, NHWC.

Parity with the reference's dormant inception_next.py (~510 LoC; SURVEY
§2.2): MetaNeXt stages (ConvNeXt layout, BatchNorm) whose token mixer is
an inception-style depthwise split — identity, dw square 3x3, dw band
1xK and Kx1 branches over channel fractions (reference
inception_next.py:22-59) — followed by a 1x1 ConvMlp with LayerScale.
MLP classifier head with an expansion fc and LayerNorm.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class InceptionNeXt(nn.Module):
    """Reference inception_next.py:230-380 (MetaNeXt)."""

    num_classes: int = 1000
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    band_kernel_size: int = 11
    branch_ratio: float = 0.125
    mlp_ratio: int = 4
    ls_init_value: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=det, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    name="stem", **p)(x.astype(self.dtype))
        x = bn("stem_norm")(x)

        bk = self.band_kernel_size
        for si, dim in enumerate(self.dims):
            if si > 0:
                x = bn(f"down{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            name=f"down{si}", **p)(x)
            gc = int(dim * self.branch_ratio)
            for j in range(self.depths[si]):
                nm = f"s{si}_b{j}"
                shortcut = x
                xi = x[..., :dim - 3 * gc]
                xhw = x[..., dim - 3 * gc:dim - 2 * gc]
                xw = x[..., dim - 2 * gc:dim - gc]
                xh = x[..., dim - gc:]
                xhw = nn.Conv(gc, (3, 3), padding=((1, 1), (1, 1)),
                              feature_group_count=gc,
                              name=f"{nm}_dw_hw", **p)(xhw)
                xw = nn.Conv(gc, (1, bk),
                             padding=((0, 0), (bk // 2, bk // 2)),
                             feature_group_count=gc,
                             name=f"{nm}_dw_w", **p)(xw)
                xh = nn.Conv(gc, (bk, 1),
                             padding=((bk // 2, bk // 2), (0, 0)),
                             feature_group_count=gc,
                             name=f"{nm}_dw_h", **p)(xh)
                y = jnp.concatenate([xi, xhw, xw, xh], axis=-1)
                y = bn(f"{nm}_norm")(y)
                y = nn.Conv(dim * self.mlp_ratio, (1, 1),
                            name=f"{nm}_fc1", **p)(y)
                y = nn.gelu(y)
                y = nn.Conv(dim, (1, 1), name=f"{nm}_fc2", **p)(y)
                if self.ls_init_value:
                    g = self.param(f"{nm}_gamma", nn.initializers.constant(
                        self.ls_init_value), (dim,), self.param_dtype)
                    y = y * g.astype(y.dtype)
                x = shortcut + y

        x = jnp.mean(x, axis=(1, 2))
        # MLP classifier head (reference :96-140)
        x = nn.gelu(nn.Dense(int(self.dims[-1] * 3), name="head_fc1",
                             **p)(x))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="head_norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _inext(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return InceptionNeXt(**merged)

    return build


_VARIANTS = {
    "inception_next_atto": dict(depths=(2, 2, 6, 2),
                                dims=(40, 80, 160, 320),
                                band_kernel_size=9, branch_ratio=0.25),
    "inception_next_tiny": dict(depths=(3, 3, 9, 3),
                                dims=(96, 192, 384, 768)),
    "inception_next_small": dict(depths=(3, 3, 27, 3),
                                 dims=(96, 192, 384, 768)),
    "inception_next_base": dict(depths=(3, 3, 27, 3),
                                dims=(128, 256, 512, 1024)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _inext(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"InceptionNeXt variant {_name!r} (reference "
                   f"inception_next.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
