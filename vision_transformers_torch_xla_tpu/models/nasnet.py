"""NASNet-A-Large and PNASNet-5-Large in Flax, NHWC.

Parity with the reference's dormant nasnet.py (598 LoC) and pnasnet.py
(377 LoC; SURVEY §2.2) — one registered name each.  Cells follow the
published NASNet-A / PNASNet-5 micro-architectures (Zoph et al. 2018
Fig. 4; Liu et al. 2018 Fig. 1): two-input cells whose branch pairs mix
stacked depthwise-separable convs (each a dw+pw applied twice, the
NASNet 'sep' op), 3x3 avg/max pools, and identities, with ReLU-conv-BN
1x1 squeezes adapting the two cell inputs.  NASNet-A-Large runs 3 groups
of 6 normal cells with reduction cells between (filters 168, stem 96);
PNASNet-5-Large runs 3 groups of 4 cells (filters 216) where every cell
uses the same 5-block PNAS genotype and reductions stride the first
block of each group.
"""
from __future__ import annotations

import sys
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ReluConvBn(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.relu(x)
        x = nn.Conv(self.features, (k, k), strides=self.stride,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv")(x)
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class _Sep(nn.Module):
    """NASNet separable: two stacked (relu -> dw kxk -> pw -> bn)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for rep in range(2):
            s = self.stride if rep == 0 else 1
            c = x.shape[-1] if rep == 0 else self.features
            x = nn.relu(x)
            x = nn.Conv(c, (k, k), strides=s, padding="SAME",
                        feature_group_count=c, use_bias=False,
                        name=f"dw{rep}", **p)(x)
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        name=f"pw{rep}", **p)(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-3,
                             name=f"bn{rep}", **p)(x)
        return x


def _pool(x, kind, stride):
    if kind == "max":
        return nn.max_pool(x, (3, 3), strides=(stride, stride),
                           padding="SAME")
    return nn.avg_pool(x, (3, 3), strides=(stride, stride),
                       padding="SAME")


class _NasCell(nn.Module):
    """NASNet-A normal/reduction cell (Zoph et al. Fig. 4)."""
    filters: int
    reduction: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h_prev, h, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.filters
        s = 2 if self.reduction else 1
        # squeeze both inputs to f channels (spatially align h_prev)
        if h_prev.shape[1] != h.shape[1]:
            h_prev = nn.avg_pool(h_prev, (1, 1), strides=(2, 2))
        hp = _ReluConvBn(f, name="squeeze_prev", **p)(h_prev, det)
        hc = _ReluConvBn(f, name="squeeze_cur", **p)(h, det)
        sep = partial(_Sep, f, **p)
        if not self.reduction:
            b1 = sep(5, name="b1_l")(hc, det) + sep(3, name="b1_r")(hp, det)
            b2 = sep(5, name="b2_l")(hp, det) + sep(3, name="b2_r")(hp, det)
            b3 = _pool(hc, "avg", 1) + hp
            b4 = _pool(hp, "avg", 1) + _pool(hp, "avg", 1)
            b5 = sep(3, name="b5_l")(hp, det) + hc
            out = jnp.concatenate([hp, b1, b2, b3, b4, b5], axis=-1)
        else:
            b1 = sep(7, 2, name="b1_l")(hp, det) + \
                sep(5, 2, name="b1_r")(hc, det)
            b2 = _pool(hc, "max", 2) + sep(7, 2, name="b2_r")(hp, det)
            b3 = _pool(hc, "avg", 2) + sep(5, 2, name="b3_r")(hp, det)
            b4 = _pool(hc, "max", 2) + sep(3, 1, name="b4_r")(b1, det)
            b5 = _pool(b1, "avg", 1) + b2
            out = jnp.concatenate([b1, b2, b3, b4, b5], axis=-1)
        return out


class _PnasCell(nn.Module):
    """PNASNet-5 cell (Liu et al. Fig. 1)."""
    filters: int
    reduction: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h_prev, h, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        f = self.filters
        s = 2 if self.reduction else 1
        if h_prev.shape[1] != h.shape[1]:
            h_prev = nn.avg_pool(h_prev, (1, 1), strides=(2, 2))
        hp = _ReluConvBn(f, name="squeeze_prev", **p)(h_prev, det)
        hc = _ReluConvBn(f, name="squeeze_cur", **p)(h, det)
        sep = partial(_Sep, f, **p)

        def maybe_proj(x, name):
            # pool branches need a projection when striding w/ chs match
            return x

        b1 = sep(5, s, name="b1_l")(hp, det) + _pool(hp, "max", s)
        b2 = sep(7, s, name="b2_l")(hc, det) + _pool(hc, "max", s)
        b3 = sep(5, s, name="b3_l")(hc, det) + sep(3, s, name="b3_r")(hc,
                                                                      det)
        b4 = sep(3, 1, name="b4_l")(b1, det) + _pool(b2, "max", 1)
        b5 = sep(3, s, name="b5_l")(hp, det) + \
            _ReluConvBn(f, 1, s, name="b5_r")(hc, det)
        return jnp.concatenate([b1, b2, b3, b4, b5], axis=-1)


class _CellNet(nn.Module):
    kind: str = "nasnet"           # 'nasnet' | 'pnasnet'
    filters: int = 168
    cells_per_stage: int = 6
    stem_width: int = 96
    num_classes: int = 1000
    drop_rate: float = 0.0
    img_size: int = 331
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cell_cls = _NasCell if self.kind == "nasnet" else _PnasCell
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_width, (3, 3), strides=2, padding="SAME",
                    use_bias=False, name="stem_conv", **p)(x)
        x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                         epsilon=1e-3, name="stem_bn", **p)(x)
        # two reduction stem cells at filters/4 and filters/2
        f = self.filters
        c0 = cell_cls(f // 4, reduction=True, name="stem_cell0",
                      **p)(x, x, det)
        c1 = cell_cls(f // 2, reduction=True, name="stem_cell1",
                      **p)(x, c0, det)
        h_prev, h = c0, c1
        for gi in range(3):
            fg = f * (2 ** gi)
            for ci in range(self.cells_per_stage):
                red = gi > 0 and ci == 0
                y = cell_cls(fg, reduction=red,
                             name=f"g{gi}_c{ci}", **p)(h_prev, h, det)
                h_prev, h = h, y
        x = nn.relu(h)
        x = x.mean(axis=(1, 2))
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate)(x, deterministic=det)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _cellnet(kind, filters, cells, stem):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "drop_path_rate"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        kw.setdefault("kind", kind)
        kw.setdefault("filters", filters)
        kw.setdefault("cells_per_stage", cells)
        kw.setdefault("stem_width", stem)
        return _CellNet(**kw)

    return build


_mod = sys.modules[__name__]
for _name, _fn in {
        "nasnetalarge": _cellnet("nasnet", 168, 6, 96),
        "pnasnet5large": _cellnet("pnasnet", 216, 4, 96),
}.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"NAS cell network {_name!r} (reference "
                   f"nasnet.py/pnasnet.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
