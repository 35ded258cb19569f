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

from vision_transformers_torch_xla_tpu.models.effnet_builder import (
    make_divisible,
)
from vision_transformers_torch_xla_tpu.models.layers import drop_path
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

# variance-preserving activation gains (deepmind nfnets constants,
# reference nfnet.py _nonlin_gamma)
_GAMMA = {"gelu": 1.7015043497085571, "relu": 1.7139588594436646,
          "silu": 1.7881293296813965}


def _make_act(kind: str):
    fn = {"gelu": lambda x: nn.gelu(x, approximate=False),
          "relu": nn.relu, "silu": nn.silu}[kind]
    g = _GAMMA[kind]
    return lambda x: fn(x) * g


class WSConv(nn.Module):
    """Scaled weight-standardized conv (reference ScaledStdConv2d)."""
    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    groups: int = 1
    use_bias: bool = True
    gain_init: float = 1.0  # conv3 is zero-gain-init unless skipinit
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
        gain = self.param("gain",
                          nn.initializers.constant(self.gain_init),
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
    # SE reduction: rd = make_divisible(chs * se_ratio, se_divisor), taken
    # from the attention input width — out_chs for the post-conv3 SE
    # (ResNet/NFNet-F position), mid_chs for reg variants (reference
    # nfnet.py:232-241)
    se_ratio: float = 0.5
    se_divisor: int = 8
    reg: bool = False  # nf_regnet: expand-from-input, mid-SE, no conv2b
    skipinit: bool = False  # dm_nfnet: learned scalar skip gain
    act: str = "gelu"
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(WSConv, dtype=self.dtype, param_dtype=self.param_dtype)
        act = _make_act(self.act)
        base = x.shape[-1] if self.reg else self.out_ch
        mid = make_divisible(base * self.bottle_ratio)
        groups = 1
        if self.group_size:
            groups = max(mid // self.group_size, 1)
            mid = groups * self.group_size
        y = act(x) * self.beta
        shortcut = x
        if self.stride > 1 or x.shape[-1] != self.out_ch:
            s = y
            if self.stride > 1:
                # torch AvgPool2d(2, 2, ceil_mode=True,
                # count_include_pad=False) parity for odd inputs
                ph, pw = s.shape[1] % 2, s.shape[2] % 2
                s = nn.avg_pool(s, (2, 2), strides=(2, 2),
                                padding=((0, ph), (0, pw)),
                                count_include_pad=False)
            shortcut = conv(self.out_ch, (1, 1), name="downsample")(s)
        y = act(conv(mid, (1, 1), name="conv1")(y))
        y = act(conv(mid, (3, 3), strides=self.stride, groups=groups,
                     name="conv2")(y))
        if self.group_size and not self.reg:  # NFNet-F second grouped 3x3
            y = act(conv(mid, (3, 3), groups=groups, name="conv2b")(y))
        if self.reg and self.attn == "se":
            # reg variants apply SE at the expanded mid chs
            y = _se(y, make_divisible(mid * self.se_ratio, self.se_divisor),
                    self.dtype, self.param_dtype, "se")
        y = conv(self.out_ch, (1, 1),
                 gain_init=1.0 if self.skipinit else 0.0, name="conv3")(y)
        if self.attn == "se" and not self.reg:
            y = _se(y, make_divisible(self.out_ch * self.se_ratio,
                                      self.se_divisor),
                    self.dtype, self.param_dtype, "se")
        elif self.attn == "eca":
            y = Eca(dtype=self.dtype, param_dtype=self.param_dtype,
                    name="eca")(y)
        if self.skipinit:
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
    final_mult: float = 2.  # final conv = final_mult * last chs (0 = none)
    num_features: int = 0  # final-conv width pre-width_factor (nf_regnet)
    width_factor: float = 1.0
    reg: bool = False
    se_ratio: float = 0.5
    se_divisor: int = 8
    skipinit: bool = False
    act: str = "gelu"
    num_classes: int = 1000
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    img_size: int = 224  # factory parity; fully convolutional
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = partial(WSConv, dtype=self.dtype, param_dtype=self.param_dtype)
        act = _make_act(self.act)
        x = x.astype(self.dtype)
        chs = [make_divisible(c * self.width_factor) for c in self.channels]
        if self.stem_type == "deep_quad":
            sc = make_divisible(128 * self.width_factor)
            x = act(conv(sc // 8, (3, 3), strides=2, name="stem_conv1")(x))
            x = act(conv(sc // 4, (3, 3), name="stem_conv2")(x))
            x = act(conv(sc // 2, (3, 3), name="stem_conv3")(x))
            x = conv(sc, (3, 3), strides=2, name="stem_conv4")(x)
        elif self.stem_type == "3x3":
            x = conv(chs[0], (3, 3), strides=2, name="stem_conv")(x)
        else:
            x = conv(64, (7, 7), strides=2, name="stem_conv")(x)
            x = nn.max_pool(act(x), (3, 3), strides=(2, 2), padding="SAME")

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        # stems with net stride 2 (the reg '3x3') put a stride-2 transition
        # in stage 0; stride-4 stems (deep_quad, 7x7_pool) do not
        stage0_stride = 2 if self.stem_type == "3x3" else 1
        expected_var, bi = 1.0, 0
        for si, (depth, ch) in enumerate(zip(self.depths, chs)):
            for blk in range(depth):
                beta = 1.0 / math.sqrt(expected_var)
                first = si == 0 and blk == 0
                x = NfBlock(ch,
                            (stage0_stride if si == 0 else 2)
                            if blk == 0 else 1, beta,
                            self.alpha, self.group_size,
                            # reg nets run the very first block unexpanded
                            # (reference nfnet.py:456)
                            1.0 if (self.reg and first)
                            else self.bottle_ratio,
                            self.attn, se_ratio=self.se_ratio,
                            se_divisor=self.se_divisor,
                            reg=self.reg, skipinit=self.skipinit,
                            act=self.act, drop_path_rate=float(dpr[bi]),
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"stages_{si}_blocks_{blk}")(x, deterministic)
                # variance reset after a transition block, else accumulate
                expected_var = (1.0 if (blk == 0) else expected_var) \
                    + self.alpha ** 2
                bi += 1
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)
        if self.num_features:
            x = conv(make_divisible(self.num_features * self.width_factor),
                     (1, 1), name="final_conv")(x)
        elif self.final_mult:
            x = conv(int(self.final_mult * self.channels[-1]), (1, 1),
                     name="final_conv")(x)
        x = act(x)
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
# reference _nfres_cfg (nfnet.py:580-613): alpha stays at the 0.2 default,
# relu act, 7x7+pool stem, no final conv
_RESNET = dict(group_size=None, bottle_ratio=0.25, act="relu",
               stem_type="7x7", final_mult=0, attn="",
               channels=(256, 512, 1024, 2048))

_VARIANTS = {}
for _n in range(8):
    _VARIANTS[f"nfnet_f{_n}"] = dict(depths=_f_depths(_n),
                                     channels=_NFNET_CH)
for _n in range(7):  # DeepMind-released weights variant (+skipinit gains)
    _VARIANTS[f"dm_nfnet_f{_n}"] = dict(depths=_f_depths(_n),
                                        channels=_NFNET_CH, skipinit=True)
# 'light' NFNets (reference nfnet.py:744-759): narrower bottleneck, SiLU,
# 1.5x final conv on l0, 2x on l1-l3
_VARIANTS["nfnet_l0"] = dict(depths=(1, 2, 6, 3), channels=_NFNET_CH,
                             bottle_ratio=0.25, group_size=64,
                             se_ratio=0.25, act="silu", final_mult=1.5)
for _n, _mult in zip(range(4), (1, 2, 3, 4)):
    _VARIANTS[f"eca_nfnet_l{_n}"] = dict(
        depths=tuple(_mult * d for d in (1, 2, 6, 3)), channels=_NFNET_CH,
        bottle_ratio=0.25, group_size=64, attn="eca", act="silu",
        final_mult=1.5 if _n == 0 else 2.0)
for _d, _depths in (("26", (2, 2, 2, 2)), ("50", (3, 4, 6, 3)),
                    ("101", (3, 4, 23, 3))):
    _VARIANTS[f"nf_resnet{_d}"] = dict(_RESNET, depths=_depths)
    _VARIANTS[f"nf_seresnet{_d}"] = dict(_RESNET, depths=_depths, attn="se",
                                         se_ratio=1 / 16)
    _VARIANTS[f"nf_ecaresnet{_d}"] = dict(_RESNET, depths=_depths, attn="eca")

# nf_regnet_b0-b5 (reference nfnet.py:618-643, 763-768): EfficientNet-like
# normalizer-free RegNets — 3x3 stem, width factor 0.75, expand-from-input
# bottle 2.25, group size 8, mid-SE rd 0.5, absolute final-conv width
_REG = dict(stem_type="3x3", group_size=8, width_factor=0.75,
            bottle_ratio=2.25, reg=True, attn="se", se_ratio=0.5,
            act="silu", alpha=0.2, final_mult=0)
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
                               se_ratio=0.25, act="silu", final_mult=0,
                               num_features=192, stem_type="deep_quad")

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _nf(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Normalizer-free variant {_name!r} (reference nfnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
