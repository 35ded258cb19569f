"""RegNet X/Y/V/Z in Flax, NHWC — full registry surface.

Parity with the reference's dormant regnet.py (1466 LoC: RegNetCfg :46-62,
width rules :65-137, trunk :532-760, model_cfgs :918-980): the quantized
linear width design (w = w0 + wa*i snapped to wm-spaced quantiles), the
group/bottleneck compatibility adjustment (incl. the torchvision
`group_min_ratio` rounding used by the `_tv` names), X (no SE) / Y (SE
0.25) bottleneck blocks, V (pre-activation) blocks, Z (inverted-bottleneck
x4, linear out, no shortcut projection, optional final conv), SiLU and
grouped-norm experimental variants.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _make_divisible(v, d, min_ratio=0.9):
    new_v = max(d, int(v + d / 2) // d * d)
    if new_v < min_ratio * v:
        new_v += d
    return new_v


def _regnet_stages(w0, wa, wm, depth, group_size, bottle_ratio,
                   group_min_ratio=0.0):
    """Per-stage (width, depth, group_count) via the reference rules
    (regnet.py:65-137 generate_regnet + adjust_widths_groups_comp)."""
    ks = np.round(np.log((w0 + wa * np.arange(depth)) / w0) / np.log(wm))
    widths = (np.round(w0 * np.power(wm, ks) / 8) * 8).astype(int)
    stage_widths, stage_depths = [], []
    for w in widths.tolist():
        if not stage_widths or stage_widths[-1] != w:
            stage_widths.append(w)
            stage_depths.append(1)
        else:
            stage_depths[-1] += 1
    # group/bottleneck compatibility (per stage)
    out = []
    for w, d in zip(stage_widths, stage_depths):
        wb = int(w * bottle_ratio)
        g = min(group_size, wb)
        if group_min_ratio:
            wb = _make_divisible(wb, g, group_min_ratio)
        else:
            wb = int(round(wb / g) * g)
        w_adj = int(wb / bottle_ratio)
        out.append((w_adj, d, max(1, wb // g)))
    return out


class _Block(nn.Module):
    width: int
    stride: int
    groups: int
    bottle_ratio: float = 1.0
    se_ratio: float = 0.0
    preact: bool = False
    linear_out: bool = False
    downsample: Optional[str] = "conv1x1"
    act: str = "relu"
    norm: str = "bn"              # 'bn' | 'gn'
    norm_gs: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _n(self, x, name, det):
        if self.norm == "gn":
            return nn.GroupNorm(num_groups=max(1, x.shape[-1] //
                                               self.norm_gs),
                                dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)(x)
        return nn.BatchNorm(use_running_average=det, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)(x)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        conv = partial(nn.Conv, use_bias=False, padding="SAME",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        act = {"relu": nn.relu, "silu": nn.silu}[self.act]
        w = self.width
        wb = int(round(w * self.bottle_ratio))
        in_ch = x.shape[-1]
        if self.preact:
            # reference PreBottleneck (regnet.py:362-433): norm1/2/3 are
            # fused norm+act BEFORE each conv, and the (identity or
            # projected) shortcut is taken AFTER norm1+act (:448-459)
            x = act(self._n(x, "norm1", det))
        shortcut = x
        if in_ch != w or self.stride > 1:
            if self.downsample is None:
                shortcut = None
            elif self.downsample == "avg":
                s = nn.avg_pool(x, (2, 2), strides=(2, 2)) \
                    if self.stride > 1 else x
                shortcut = conv(w, (1, 1), name="down_conv")(s)
                if not self.preact:
                    shortcut = self._n(shortcut, "down_norm", det)
            else:
                shortcut = conv(w, (1, 1), strides=self.stride,
                                name="down_conv")(x)
                if not self.preact:
                    shortcut = self._n(shortcut, "down_norm", det)
        y = conv(wb, (1, 1), name="conv1")(x)
        # between conv1 and conv2: preact's norm2 == non-preact's norm1
        # (post-conv1) — same computation site, timm-native name each way
        y = act(self._n(y, "norm2" if self.preact else "norm1", det))
        y = conv(wb, (3, 3), strides=self.stride,
                 feature_group_count=self.groups, name="conv2")(y)
        if not self.preact:
            y = act(self._n(y, "norm2", det))
        if self.se_ratio > 0:
            rd = max(1, int(in_ch * self.se_ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(rd, (1, 1), dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="se_reduce")(s))
            s = nn.sigmoid(nn.Conv(wb, (1, 1), dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="se_expand")(s))
            y = y * s
        if self.preact:
            y = act(self._n(y, "norm3", det))
        y = conv(w, (1, 1), name="conv3")(y)
        if not self.preact:
            y = self._n(y, "norm3", det)
        if shortcut is not None:
            y = y + shortcut
        # reference PreBottleneck has no post-residual act (:459-460);
        # Bottleneck's act3 is Identity when linear_out (:324)
        if not self.linear_out and not self.preact:
            y = act(y)
        return y


class RegNet(nn.Module):
    w0: int = 80
    wa: float = 42.63
    wm: float = 2.66
    depth: int = 21
    group_size: int = 24
    bottle_ratio: float = 1.0
    se_ratio: float = 0.0
    group_min_ratio: float = 0.0
    stem_width: int = 32
    downsample: Optional[str] = "conv1x1"
    linear_out: bool = False
    preact: bool = False
    num_features: int = 0
    act: str = "relu"
    norm: str = "bn"
    norm_gs: int = 16
    num_classes: int = 1000
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        act = {"relu": nn.relu, "silu": nn.silu}[self.act]
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_width, (3, 3), strides=2, padding="SAME",
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="stem_conv")(x)
        if not self.preact:
            x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="stem_bn")(x)
            x = act(x)
        for si, (width, d, groups) in enumerate(
                _regnet_stages(self.w0, self.wa, self.wm, self.depth,
                               self.group_size, self.bottle_ratio,
                               self.group_min_ratio)):
            for bi in range(d):
                x = _Block(width, stride=2 if bi == 0 else 1,
                           groups=groups, bottle_ratio=self.bottle_ratio,
                           se_ratio=self.se_ratio, preact=self.preact,
                           linear_out=self.linear_out,
                           downsample=self.downsample, act=self.act,
                           norm=self.norm, norm_gs=self.norm_gs,
                           dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"stages_{si}_blocks_{bi}")(x, det)
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)
        if self.num_features:
            x = nn.Conv(self.num_features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="final_conv")(x)
            x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="final_conv_bn")(x)
            x = act(x)
        elif self.linear_out or self.preact:
            # reference regnet.py:609-610: final_conv degenerates to a bare
            # act for linear_out/preact trunks (no norm — preact included)
            x = act(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _make(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "drop_path_rate"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return RegNet(**merged)

    return build


def _x(w0, wa, wm, gs, d, **kw):
    return dict(w0=w0, wa=wa, wm=wm, group_size=gs, depth=d, **kw)


def _y(w0, wa, wm, gs, d, **kw):
    return dict(w0=w0, wa=wa, wm=wm, group_size=gs, depth=d, se_ratio=0.25,
                **kw)


_VARIANTS = {
    # RegNet-X (reference regnet.py:919-931)
    "regnetx_002": _x(24, 36.44, 2.49, 8, 13),
    "regnetx_004": _x(24, 24.48, 2.54, 16, 22),
    "regnetx_004_tv": _x(24, 24.48, 2.54, 16, 22, group_min_ratio=0.9),
    "regnetx_006": _x(48, 36.97, 2.24, 24, 16),
    "regnetx_008": _x(56, 35.73, 2.28, 16, 16),
    "regnetx_016": _x(80, 34.01, 2.25, 24, 18),
    "regnetx_032": _x(88, 26.31, 2.25, 48, 25),
    "regnetx_040": _x(96, 38.65, 2.43, 40, 23),
    "regnetx_064": _x(184, 60.83, 2.07, 56, 17),
    "regnetx_080": _x(80, 49.56, 2.88, 120, 23),
    "regnetx_120": _x(168, 73.36, 2.37, 112, 19),
    "regnetx_160": _x(216, 55.59, 2.1, 128, 22),
    "regnetx_320": _x(320, 69.86, 2.0, 168, 23),
    # RegNet-Y (:934-952)
    "regnety_002": _y(24, 36.44, 2.49, 8, 13),
    "regnety_004": _y(48, 27.89, 2.09, 8, 16),
    "regnety_006": _y(48, 32.54, 2.32, 16, 15),
    "regnety_008": _y(56, 38.84, 2.4, 16, 14),
    "regnety_008_tv": _y(56, 38.84, 2.4, 16, 14, group_min_ratio=0.9),
    "regnety_016": _y(48, 20.71, 2.65, 24, 27),
    "regnety_032": _y(80, 42.63, 2.66, 24, 21),
    "regnety_040": _y(96, 31.41, 2.24, 64, 22),
    "regnety_064": _y(112, 33.22, 2.27, 72, 25),
    "regnety_080": _y(192, 76.82, 2.19, 56, 17),
    "regnety_080_tv": _y(192, 76.82, 2.19, 56, 17, group_min_ratio=0.9),
    "regnety_120": _y(168, 73.36, 2.37, 112, 19),
    "regnety_160": _y(200, 106.23, 2.48, 112, 18),
    "regnety_320": _y(232, 115.89, 2.53, 232, 20),
    "regnety_640": _y(352, 147.48, 2.4, 328, 20),
    "regnety_1280": _y(456, 160.83, 2.52, 264, 27),
    "regnety_2560": _y(640, 230.83, 2.53, 373, 27),
    # experimental (:955-961)
    "regnety_040_sgn": _y(96, 31.41, 2.24, 64, 22, act="silu", norm="gn",
                          norm_gs=16),
    # regnetv = preact regnet-y (:964-968)
    "regnetv_040": _y(96, 31.41, 2.24, 64, 22, preact=True, act="silu"),
    "regnetv_064": _y(112, 33.22, 2.27, 72, 25, preact=True, act="silu",
                      downsample="avg"),
    # RegNet-Z (:971-979)
    "regnetz_005": dict(w0=16, wa=10.7, wm=2.51, group_size=4, depth=21,
                        bottle_ratio=4.0, se_ratio=0.25, downsample=None,
                        linear_out=True, num_features=1024, act="silu"),
    "regnetz_040": dict(w0=48, wa=14.5, wm=2.226, group_size=8, depth=28,
                        bottle_ratio=4.0, se_ratio=0.25, downsample=None,
                        linear_out=True, num_features=0, act="silu"),
    "regnetz_040_h": dict(w0=48, wa=14.5, wm=2.226, group_size=8,
                          depth=28, bottle_ratio=4.0, se_ratio=0.25,
                          downsample=None, linear_out=True,
                          num_features=1536, act="silu"),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _make(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"RegNet variant {_name!r} (reference regnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
