"""Normalizer-Free networks (NFNet-F, NF-ResNet) in Flax, NHWC.

Parity with the reference's dormant nfnet.py (1172 LoC; SURVEY §2.2):
batch-norm-free residual networks à la Brock et al. —

* scaled weight-standardized convolutions (per-output-channel zero-mean /
  fan-in-scaled unit-variance kernels with a learned gain)
* variance-preserving residual blocks: ``x + alpha * f(act(x) * beta)``
  with beta tracking the accumulated variance and a zero-init skip gain
* gamma-scaled activations (gelu gamma ~= 1.7015)
* squeeze-excite (NFNet-F) or ECA (eca_nfnet_l*) channel attention

`nf_regnet_*` names are not registered (RegNet widths live in regnet.py;
the nf variant adds little surface). Everything else in the reference's
registry rides this trunk: nfnet_f0-f7, dm_nfnet_f0-f6, nfnet_l0,
eca_nfnet_l0-l3, nf_(se|eca)resnet26/50/101.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

_GAMMA_GELU = 1.7015043497085571  # variance-preserving gelu scale


def _act(x):
    return nn.gelu(x, approximate=False) * _GAMMA_GELU


class WSConv(nn.Module):
    """Scaled weight-standardized conv (reference ScaledStdConv2d)."""
    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1] // self.groups
        w = self.param("kernel", nn.initializers.he_normal(),
                       (kh, kw, cin, self.features), self.param_dtype)
        fan_in = kh * kw * cin
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        var = w.var(axis=(0, 1, 2), keepdims=True)
        gain = self.param("gain", nn.initializers.ones,
                          (self.features,), self.param_dtype)
        w = (w - mean) * jax.lax.rsqrt(var * fan_in + 1e-8) * gain
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.strides, self.strides), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
            y = y + b.astype(y.dtype)
        return y


def _se(x, rd_ch: int, dtype, param_dtype, name: str):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = nn.relu(nn.Conv(rd_ch, (1, 1), dtype=dtype, param_dtype=param_dtype,
                        name=f"{name}_reduce")(s))
    s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=dtype,
                           param_dtype=param_dtype, name=f"{name}_expand")(s))
    return x * (2.0 * s)  # nfnet doubles the SE output


class Eca(nn.Module):
    """Efficient channel attention: 1-D conv over the channel descriptor."""
    kernel: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))[:, :, None]  # (B, C, 1)
        s = nn.Conv(1, (self.kernel,), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(s)
        return x * (2.0 * nn.sigmoid(s[..., 0]))[:, None, None, :]


class NfBlock(nn.Module):
    out_ch: int
    stride: int
    beta: float
    alpha: float
    group_size: Optional[int]  # None -> plain conv
    bottle_ratio: float
    attn: str  # 'se' | 'eca' | ''
    se_ratio: float = 0.5
    reg: bool = False  # nf_regnet: expand-from-input, mid-SE, no conv2b
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(WSConv, dtype=self.dtype, param_dtype=self.param_dtype)
        base = x.shape[-1] if self.reg else self.out_ch
        mid = int(base * self.bottle_ratio)
        groups = 1
        if self.group_size:
            groups = max(mid // self.group_size, 1)
            mid = groups * self.group_size
        y = _act(x) * self.beta
        shortcut = x
        if self.stride > 1 or x.shape[-1] != self.out_ch:
            s = y
            if self.stride > 1:
                s = nn.avg_pool(s, (2, 2), strides=(2, 2))
            shortcut = conv(self.out_ch, (1, 1), name="downsample")(s)
        y = _act(conv(mid, (1, 1), name="conv1")(y))
        y = _act(conv(mid, (3, 3), strides=self.stride, groups=groups,
                      name="conv2")(y))
        if self.group_size and not self.reg:  # NFNet-F second grouped 3x3
            y = _act(conv(mid, (3, 3), groups=groups, name="conv2b")(y))
        if self.reg and self.attn == "se":
            # reg variants apply SE at the expanded mid chs
            y = _se(y, max(1, int(mid * self.se_ratio)), self.dtype,
                    self.param_dtype, "se")
        y = conv(self.out_ch, (1, 1), name="conv3")(y)
        if self.attn == "se" and not self.reg:
            y = _se(y, max(1, int(self.out_ch * self.se_ratio * self.bottle_ratio)),
                    self.dtype, self.param_dtype, "se")
        elif self.attn == "eca":
            y = Eca(dtype=self.dtype, param_dtype=self.param_dtype,
                    name="eca")(y)
        skip_gain = self.param("skip_gain", nn.initializers.zeros,
                               (), self.param_dtype)
        y = y * skip_gain.astype(y.dtype)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return shortcut + self.alpha * drop_path(y, self.drop_path_rate,
                                                 deterministic, rng)


class NormFreeNet(nn.Module):
    depths: Sequence[int] = (1, 2, 6, 3)
    channels: Sequence[int] = (256, 512, 1536, 1536)
    group_size: Optional[int] = 128
    bottle_ratio: float = 0.5
    attn: str = "se"
    alpha: float = 0.2
    stem_type: str = "deep_quad"  # 'deep_quad'|'7x7'|'3x3' (nf_regnet)
    final_mult: int = 2  # final conv = final_mult * last channels (0 = none)
    num_features: int = 0  # absolute final-conv width (nf_regnet); wins
    width_factor: float = 1.0
    reg: bool = False
    se_ratio: float = 0.5
    num_classes: int = 1000
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(WSConv, dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        chs = [int(round(c * self.width_factor / 8) * 8) or 8
               for c in self.channels]
        if self.stem_type == "deep_quad":
            x = _act(conv(16, (3, 3), strides=2, name="stem_conv1")(x))
            x = _act(conv(32, (3, 3), name="stem_conv2")(x))
            x = _act(conv(64, (3, 3), name="stem_conv3")(x))
            x = conv(128, (3, 3), strides=2, name="stem_conv4")(x)
        elif self.stem_type == "3x3":
            x = conv(chs[0], (3, 3), strides=2, name="stem_conv")(x)
        else:
            x = conv(64, (7, 7), strides=2, name="stem_conv")(x)
            x = nn.max_pool(_act(x), (3, 3), strides=(2, 2), padding="SAME")

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        expected_var, bi = 1.0, 0
        for si, (depth, ch) in enumerate(zip(self.depths, chs)):
            for blk in range(depth):
                beta = 1.0 / math.sqrt(expected_var)
                x = NfBlock(ch, 2 if (blk == 0 and si > 0) else 1, beta,
                            self.alpha, self.group_size, self.bottle_ratio,
                            self.attn, se_ratio=self.se_ratio,
                            reg=self.reg, drop_path_rate=float(dpr[bi]),
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"stages_{si}_blocks_{blk}")(x, deterministic)
                # variance reset after a transition block, else accumulate
                expected_var = (1.0 if (blk == 0) else expected_var) \
                    + self.alpha ** 2
                bi += 1
        if self.num_features:
            x = conv(self.num_features, (1, 1), name="final_conv")(x)
        elif self.final_mult:
            x = conv(self.final_mult * self.channels[-1], (1, 1),
                     name="final_conv")(x)
        x = _act(x)
        x = x.mean(axis=(1, 2))
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _nf(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return NormFreeNet(**merged)

    return build


def _f_depths(n):  # NFNet-Fn: (n+1) x (1, 2, 6, 3)
    return tuple((n + 1) * d for d in (1, 2, 6, 3))


_NFNET_CH = (256, 512, 1536, 1536)
_RESNET = dict(group_size=None, bottle_ratio=0.25, alpha=1.0,
               stem_type="7x7", final_mult=0, attn="",
               channels=(256, 512, 1024, 2048))

_VARIANTS = {}
for _n in range(8):
    _VARIANTS[f"nfnet_f{_n}"] = dict(depths=_f_depths(_n),
                                     channels=_NFNET_CH)
for _n in range(7):  # DeepMind-released weights variant (same arch)
    _VARIANTS[f"dm_nfnet_f{_n}"] = dict(depths=_f_depths(_n),
                                        channels=_NFNET_CH)
_VARIANTS["nfnet_l0"] = dict(depths=(1, 2, 6, 3), channels=_NFNET_CH,
                             bottle_ratio=0.25, group_size=64)
for _n, _mult in zip(range(4), (1, 2, 3, 4)):
    _VARIANTS[f"eca_nfnet_l{_n}"] = dict(
        depths=tuple(_mult * d for d in (1, 2, 6, 3)), channels=_NFNET_CH,
        bottle_ratio=0.25, group_size=64, attn="eca")
for _d, _depths in (("26", (2, 2, 2, 2)), ("50", (3, 4, 6, 3)),
                    ("101", (3, 4, 23, 3))):
    _VARIANTS[f"nf_resnet{_d}"] = dict(_RESNET, depths=_depths)
    _VARIANTS[f"nf_seresnet{_d}"] = dict(_RESNET, depths=_depths, attn="se")
    _VARIANTS[f"nf_ecaresnet{_d}"] = dict(_RESNET, depths=_depths, attn="eca")

# nf_regnet_b0-b5 (reference nfnet.py:618-643, 763-768): EfficientNet-like
# normalizer-free RegNets — 3x3 stem, width factor 0.75, expand-from-input
# bottle 2.25, group size 8, mid-SE rd 0.5, absolute final-conv width
_REG = dict(stem_type="3x3", group_size=8, width_factor=0.75,
            bottle_ratio=2.25, reg=True, attn="se", se_ratio=0.5,
            alpha=0.2, final_mult=0)
for _n, (_depths, _chs) in {
        "b0": ((1, 3, 6, 6), (48, 104, 208, 440)),
        "b1": ((2, 4, 7, 7), (48, 104, 208, 440)),
        "b2": ((2, 4, 8, 8), (56, 112, 232, 488)),
        "b3": ((2, 5, 9, 9), (56, 128, 248, 528)),
        "b4": ((2, 6, 11, 11), (64, 144, 288, 616)),
        "b5": ((3, 7, 14, 14), (80, 168, 336, 704))}.items():
    _VARIANTS[f"nf_regnet_{_n}"] = dict(_REG, depths=_depths,
                                        channels=_chs,
                                        num_features=1280 * _chs[-1] // 440)
_VARIANTS["test_nfnet"] = dict(depths=(1, 1, 1, 1),
                               channels=(32, 64, 96, 128),
                               group_size=8, bottle_ratio=0.25,
                               se_ratio=0.25, final_mult=0,
                               num_features=192, stem_type="3x3")

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _nf(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Normalizer-free variant {_name!r} (reference nfnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
