"""Universal EfficientNet-family arch-string builder in Flax, NHWC.

TPU-native re-design of the reference's block-arch decoder subsystem
(reference models/_efficientnet_builder.py:1-576 `decode_arch_def` /
`EfficientNetBuilder`, models/_efficientnet_blocks.py block classes).
One generic trunk (`EffNet`) decodes timm-style arch-definition strings
("ir_r2_k3_s2_e6_c24_se0.25", ...) into stacks of:

  cn   Conv + Norm + Act                (optional skip)
  ds   depthwise-separable              (dsa = with pointwise act, no skip)
  ir   inverted residual / MBConv       (optional mixed kernels, CondConv,
                                         grouped "dw" conv via gs tokens)
  er   edge residual (fused expand conv)
  uir  universal inverted residual      (MobileNetV4, dw start/mid/end)
  mqa/mha  mobile attention             (MobileNetV4/V5 hybrids)

plus squeeze-excite, space-to-depth regions (EfficientNet-X `d` tokens),
stochastic depth, and width (`round_channels`) / depth
(`_scale_stage_depth`) multiplier scaling whose arithmetic matches the
reference so the generated layer/channel plans line up name-for-name.

Everything is resolution-agnostic and static-shaped: block specs are
decoded to hashable tuples at module-construction time (Python), so the
jitted forward is a straight-line XLA graph — no dynamic control flow.
Convs run in NHWC bf16 (MXU-friendly); norms compute in fp32 params.

Norm options cover the reference surface: BatchNorm (default),
GroupNorm (`_gn` names), LayerNorm (`_ln`), EvoNorm-S0 (`_evos`),
RMSNorm (MobileNetV5).  CondConv is realised as routing-weighted expert
output mixing — convolution is linear in the kernel, so mixing outputs
equals mixing kernels, and it keeps a single static conv per expert on
the MXU instead of per-sample gathered weights.
"""
from __future__ import annotations

import math
import re
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path

__all__ = ["EffNet", "decode_arch_def", "round_channels"]


# ---------------------------------------------------------------------------
# channel / depth scaling arithmetic (parity: _efficientnet_builder.py:63-67,
# 232-266)
# ---------------------------------------------------------------------------

def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None,
                   round_limit: float = 0.9) -> int:
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


def round_channels(channels: float, multiplier: float = 1.0, divisor: int = 8,
                   channel_min: Optional[int] = None,
                   round_limit: float = 0.9) -> int:
    if not multiplier:
        return int(channels)
    return make_divisible(channels * multiplier, divisor, channel_min,
                          round_limit=round_limit)


def _parse_ksize(ss: str):
    if ss.isdigit():
        return int(ss)
    return tuple(int(k) for k in ss.split("."))


_ACT_TOKENS = {"re": "relu", "r6": "relu6", "hs": "hard_swish",
               "sw": "silu", "mi": "mish", "ge": "gelu"}


def _decode_block_str(block_str: str) -> Tuple[Dict[str, Any], int]:
    """One "ir_r2_k3_s2_e6_c24_se0.25" string -> (block dict, repeats).

    Token grammar parity: _efficientnet_builder.py:80-230.
    """
    parts = block_str.split("_")
    bt = parts[0]
    opts: Dict[str, str] = {}
    skip = None
    act = None
    for op in parts[1:]:
        if op == "noskip":
            skip = False
        elif op == "skip":
            skip = True
        elif op.startswith("n") and op[1:] in _ACT_TOKENS:
            act = _ACT_TOKENS[op[1:]]
        else:
            m = re.split(r"(\d.*)", op)
            if len(m) >= 2:
                opts[m[0]] = m[1]

    num_repeat = int(opts.get("r", 1))
    b: Dict[str, Any] = dict(bt=bt, out=int(opts["c"]), s=int(opts["s"]),
                             act=act)
    if bt == "ir":
        b.update(k=_parse_ksize(opts["k"]),
                 a=_parse_ksize(opts["a"]) if "a" in opts else 1,
                 p=_parse_ksize(opts["p"]) if "p" in opts else 1,
                 e=float(opts["e"]), se=float(opts.get("se", 0.0)),
                 noskip=skip is False, d=int(opts.get("d", 0)) > 0)
        if "cc" in opts:
            b["cc"] = int(opts["cc"])
    elif bt in ("ds", "dsa"):
        b.update(k=_parse_ksize(opts["k"]),
                 p=_parse_ksize(opts["p"]) if "p" in opts else 1,
                 se=float(opts.get("se", 0.0)), pw_act=bt == "dsa",
                 noskip=bt == "dsa" or skip is False,
                 d=int(opts.get("d", 0)) > 0)
        b["bt"] = "ds"
    elif bt == "er":
        b.update(k=_parse_ksize(opts["k"]),
                 p=_parse_ksize(opts["p"]) if "p" in opts else 1,
                 e=float(opts["e"]), fc=int(opts.get("fc", 0)),
                 se=float(opts.get("se", 0.0)), noskip=skip is False)
    elif bt == "cn":
        b.update(k=int(opts["k"]), skip=skip is True)
    elif bt == "uir":
        b.update(a=_parse_ksize(opts["a"]) if "a" in opts else 0,
                 k=_parse_ksize(opts["k"]),
                 p=_parse_ksize(opts["p"]) if "p" in opts else 0,
                 e=float(opts["e"]), se=float(opts.get("se", 0.0)),
                 noskip=skip is False)
    elif bt in ("mqa", "mha"):
        b.update(k=_parse_ksize(opts["k"]), h=int(opts["h"]),
                 kd=int(opts["d"]), v=int(opts.get("v", 1)),
                 noskip=skip is False)
    else:
        raise ValueError(f"unknown block type {bt!r} in {block_str!r}")
    if "gs" in opts:
        b["gs"] = int(opts["gs"])
    return b, num_repeat


def _scale_stage_depth(stack, repeats, depth_multiplier=1.0,
                       depth_trunc="ceil"):
    """Distribute a scaled stage-repeat budget over block defs.

    Arithmetic parity with _efficientnet_builder.py:232-266 (reverse
    allocation so the first block is least likely to be repeated).
    """
    num_repeat = sum(repeats)
    if depth_trunc == "round":
        num_repeat_scaled = max(1, round(num_repeat * depth_multiplier))
    else:
        num_repeat_scaled = int(math.ceil(num_repeat * depth_multiplier))
    repeats_scaled = []
    for r in repeats[::-1]:
        rs = max(1, round(r / num_repeat * num_repeat_scaled))
        repeats_scaled.append(rs)
        num_repeat -= r
        num_repeat_scaled -= rs
    repeats_scaled = repeats_scaled[::-1]
    out = []
    for ba, rep in zip(stack, repeats_scaled):
        for i in range(rep):
            d = dict(ba)
            if i > 0:
                d["s"] = 1  # only the first block in a stack may stride
            out.append(d)
    return out


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw(spec) -> Dict[str, Any]:
    return {k: v for k, v in spec}


def decode_arch_def(arch_def, depth_multiplier=1.0, depth_trunc="ceil",
                    experts_multiplier=1, fix_first_last=False,
                    group_size=None):
    """Arch-definition strings -> frozen nested block-spec tuples.

    Semantics parity: _efficientnet_builder.py:270-312 `decode_arch_def`.
    Returns a hashable structure usable as a Flax module field.
    """
    if not isinstance(depth_multiplier, (tuple, list)):
        depth_multiplier = (depth_multiplier,) * len(arch_def)
    stages = []
    for si, (block_strs, mult) in enumerate(zip(arch_def, depth_multiplier)):
        stack, repeats = [], []
        for bs in block_strs:
            ba, rep = _decode_block_str(bs)
            if ba.get("cc", 0) and experts_multiplier > 1:
                ba["cc"] *= experts_multiplier
            if group_size is not None:
                ba.setdefault("gs", group_size)
            stack.append(ba)
            repeats.append(rep)
        if fix_first_last and (si == 0 or si == len(arch_def) - 1):
            stages.append(_scale_stage_depth(stack, repeats, 1.0, depth_trunc))
        else:
            stages.append(_scale_stage_depth(stack, repeats, mult,
                                             depth_trunc))
    return _freeze(stages)


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def _act(name: str):
    return {
        "relu": nn.relu,
        "relu6": nn.relu6,
        "silu": nn.silu,
        "swish": nn.silu,
        "gelu": nn.gelu,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "hard_swish": lambda x: x * nn.relu6(x + 3.0) / 6.0,
        "hard_sigmoid": lambda x: nn.relu6(x + 3.0) / 6.0,
        "sigmoid": nn.sigmoid,
    }[name]


class _Norm(nn.Module):
    """Configurable norm: bn / gn / ln / evos / rms (reference `_gn`,
    `_ln`, `_evos` test/GroupNorm names and MobileNetV5 RmsNorm2d)."""
    kind: str = "bn"
    group_size: int = 8
    eps: float = 1e-3
    deterministic: bool = True
    act: Optional[str] = None  # fused post-act (evos ignores: act built-in)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.kind == "bn":
            x = nn.BatchNorm(use_running_average=self.deterministic,
                             momentum=0.9, epsilon=self.eps, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(x)
        elif self.kind == "gn":
            groups = max(1, c // self.group_size)
            x = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="norm")(x)
        elif self.kind == "ln":
            x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="norm")(x)
        elif self.kind == "rms":
            x = nn.RMSNorm(epsilon=self.eps, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="norm")(x)
        elif self.kind == "evos":
            # EvoNorm-S0: x * sigmoid(v x) / group_std * w + b
            v = self.param("v", nn.initializers.ones, (c,), self.param_dtype)
            w = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
            b = self.param("bias", nn.initializers.zeros, (c,),
                           self.param_dtype)
            groups = max(1, c // self.group_size)
            xf = x.astype(jnp.float32)
            g = xf.reshape(*x.shape[:-1], groups, c // groups)
            std = jnp.sqrt(g.var(axis=(1, 2, 4), keepdims=True) + self.eps)
            std = jnp.broadcast_to(std, g.shape).reshape(x.shape)
            xf = xf * nn.sigmoid(v * xf) / std * w + b
            return xf.astype(self.dtype)
        else:
            raise ValueError(f"unknown norm {self.kind!r}")
        if self.act is not None:
            x = _act(self.act)(x)
        return x


def _split_channels(total: int, groups: int):
    base = total // groups
    split = [base] * groups
    split[0] += total - base * groups
    return split


class _MixedConv(nn.Module):
    """Mixed-kernel conv (MixNet): channel split, one kernel per group.
    Parity with timm MixedConv2d used via `k3.5.7` tokens."""
    out_ch: int
    kernels: Tuple[int, ...]
    stride: int = 1
    depthwise: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_splits = _split_channels(x.shape[-1], len(self.kernels))
        out_splits = _split_channels(self.out_ch, len(self.kernels))
        xs = jnp.split(x, np.cumsum(in_splits)[:-1], axis=-1)
        ys = []
        for i, (xi, k) in enumerate(zip(xs, self.kernels)):
            groups = in_splits[i] if self.depthwise else 1
            oc = in_splits[i] if self.depthwise else out_splits[i]
            ys.append(nn.Conv(oc, (k, k), strides=self.stride, padding="SAME",
                              feature_group_count=groups, use_bias=False,
                              dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"conv_{i}")(xi))
        return jnp.concatenate(ys, axis=-1)


def _blur_pool(x, stride: int = 2):
    """Fixed binomial 3x3 anti-aliasing filter + stride (no params).
    Stands in for the reference's `aa_layer='blurpc'` BlurPool."""
    k = jnp.array([1.0, 2.0, 1.0], dtype=x.dtype)
    k2 = (k[:, None] * k[None, :]) / 16.0
    c = x.shape[-1]
    kernel = jnp.tile(k2[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


class _Conv(nn.Module):
    """Conv with optional mixed kernels / groups / CondConv experts /
    anti-aliased stride.  The single parameterisation point for every
    conv in the trunk."""
    out_ch: int
    kernel: Any = 1               # int or tuple of ints (mixed)
    stride: int = 1
    groups: int = 1               # ignored for mixed/depthwise path
    depthwise: bool = False
    experts: int = 0              # CondConv expert count (0 = off)
    aa: str = ""                  # '', 'avg', 'blur' — stride via AA filter
    bias: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, routing=None):
        stride = self.stride
        post_aa = None
        if self.aa and self.stride > 1:
            post_aa, stride = self.aa, 1
        if isinstance(self.kernel, tuple) and len(self.kernel) > 1:
            y = _MixedConv(self.out_ch, self.kernel, stride,
                           depthwise=self.depthwise, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="mixed")(x)
        else:
            k = self.kernel[0] if isinstance(self.kernel, tuple) \
                else self.kernel
            groups = x.shape[-1] if self.depthwise else self.groups
            conv = partial(nn.Conv, self.out_ch, (k, k), strides=stride,
                           padding="SAME", feature_group_count=groups,
                           use_bias=self.bias, dtype=self.dtype,
                           param_dtype=self.param_dtype)
            if self.experts and routing is not None:
                # conv is linear in its kernel: mixing expert outputs with
                # per-sample routing == per-sample mixed kernels (CondConv)
                ys = jnp.stack([conv(name=f"expert_{e}")(x)
                                for e in range(self.experts)], axis=0)
                y = jnp.einsum("ebhwc,be->bhwc", ys,
                               routing.astype(ys.dtype))
            else:
                y = conv(name="conv")(x)
        if post_aa == "blur":
            y = _blur_pool(y, self.stride)
        elif post_aa == "avg":
            y = nn.avg_pool(y, (2, 2), strides=(self.stride, self.stride),
                            padding="SAME")
        return y


# ---------------------------------------------------------------------------
# attention primitives for mqa/mha blocks (MobileNetV4/V5 hybrids)
# ---------------------------------------------------------------------------

class _Attention2d(nn.Module):
    """Full MHSA over spatial positions (reference `mha` token path,
    _efficientnet_blocks.py MobileAttention + Attention2d)."""
    out_ch: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        qkv = nn.Conv(self.out_ch * 3, (1, 1), use_bias=False,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads,
                          self.out_ch // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = (self.out_ch // self.num_heads) ** -0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v)
        y = y.reshape(B, H, W, self.out_ch)
        return nn.Conv(self.out_ch, (1, 1), use_bias=True, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj")(y)


class _MultiQueryAttention2d(nn.Module):
    """Multi-query attention with optional spatial KV downsampling
    (reference `mqa` token path; MobileNetV4 paper §4).  One shared K/V
    head; per-head queries."""
    out_ch: int
    num_heads: int
    key_dim: int
    value_dim: int
    kv_stride: int = 1
    dw_kernel: int = 3
    norm_kind: str = "bn"
    norm_eps: float = 1e-3
    deterministic: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        q = nn.Conv(self.num_heads * self.key_dim, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="query")(x)
        kv_in = x
        if self.kv_stride > 1:
            kv_in = nn.Conv(C, (self.dw_kernel, self.dw_kernel),
                            strides=self.kv_stride, padding="SAME",
                            feature_group_count=C, use_bias=False,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="kv_down")(kv_in)
            kv_in = _Norm(kind=self.norm_kind, eps=self.norm_eps,
                          deterministic=self.deterministic, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="kv_norm")(kv_in)
        k = nn.Conv(self.key_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="key")(kv_in)
        v = nn.Conv(self.value_dim, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="value")(kv_in)
        L = kv_in.shape[1] * kv_in.shape[2]
        q = q.reshape(B, H * W, self.num_heads, self.key_dim)
        k = k.reshape(B, L, self.key_dim)
        v = v.reshape(B, L, self.value_dim)
        attn = jnp.einsum("bqhd,bkd->bhqk", q * self.key_dim ** -0.5, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        y = jnp.einsum("bhqk,bkd->bqhd", attn.astype(v.dtype), v)
        y = y.reshape(B, H, W, self.num_heads * self.value_dim)
        return nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="output")(y)


# ---------------------------------------------------------------------------
# the trunk
# ---------------------------------------------------------------------------

class EffNet(nn.Module):
    """Generic EfficientNet/MobileNet-family trunk driven by decoded
    arch specs (see module docstring).  Covers the reference's
    EfficientNet (efficientnet.py:241-438), MobileNetV3/V4 head styles
    (mobilenetv3.py:29-328) and MobileNetV5 MSFA (mobilenetv5.py:26-114).
    """
    block_args: Tuple                     # from decode_arch_def (frozen)
    stem_size: int = 32
    fix_stem: bool = False
    stem_kernel_size: int = 3
    stem_act: Optional[str] = None        # None -> model act
    num_features: int = 1280              # 0 -> no head conv
    head_style: str = "effnet"            # 'effnet' | 'mnv3' | 'msfa'
    head_bias: bool = True                # mnv3 head conv bias
    head_norm: bool = False               # mnv3 head conv norm (mnv4)
    act: str = "silu"
    norm: str = "bn"
    norm_group_size: int = 8
    bn_eps: float = 1e-3
    round_mult: float = 1.0
    round_divisor: int = 8
    round_limit: float = 0.9
    se_from_exp: bool = False
    se_gate: str = "sigmoid"
    se_force_act: Optional[str] = None    # e.g. 'relu' for mnv3-style SE
    se_round_divisible: bool = False      # round SE chs with make_divisible
    se_kind: str = "se"                   # 'se' | 'gc' (GlobalContext attn)
    aa: str = ""                          # '', 'avg', 'blur'
    layer_scale_init_value: Optional[float] = None
    msfa_indices: Tuple[int, ...] = (-2, -1)
    msfa_output_resolution: int = 16
    num_classes: int = 1000
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    global_pool: str = "avg"
    img_size: int = 224                   # factory parity; fully conv
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def _round(self, c):
        return round_channels(c, self.round_mult, self.round_divisor,
                              round_limit=self.round_limit)

    def _se_ch(self, base_ch: float, ratio: float) -> int:
        if self.se_round_divisible:
            return make_divisible(base_ch * ratio)
        return max(1, int(round(base_ch * ratio)))

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        norm = partial(_Norm, kind=self.norm,
                       group_size=self.norm_group_size, eps=self.bn_eps,
                       deterministic=deterministic, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        conv = partial(_Conv, dtype=self.dtype, param_dtype=self.param_dtype)
        se_conv = partial(nn.Conv, padding="SAME", use_bias=True,
                          dtype=self.dtype, param_dtype=self.param_dtype)
        act = _act(self.act)
        x = x.astype(self.dtype)

        stem_ch = self.stem_size if self.fix_stem \
            else self._round(self.stem_size)
        x = conv(stem_ch, self.stem_kernel_size, stride=2,
                 name="stem_conv")(x)
        x = norm(act=self.stem_act or self.act, name="stem_norm")(x)

        stages = [[_thaw(b) for b in stage] for stage in self.block_args]
        total = sum(len(s) for s in stages) or 1
        bi = 0
        in_ch = stem_ch
        s2d = False  # inside a space-to-depth region (EfficientNet-X)
        stage_outs = []
        for si, stage in enumerate(stages):
            for bj, b in enumerate(stage):
                dpr = self.drop_path_rate * bi / total
                name = f"s{si}_b{bj}"
                bt = b["bt"]
                bact = b.get("act") or self.act
                out_ch = self._round(b["out"])
                stride = b["s"]
                start_s2d = b.get("d", False) and not s2d
                if start_s2d:
                    s2d = True
                end_s2d = s2d and stride == 2 and not start_s2d
                if s2d and not end_s2d:
                    out_ch *= 4
                if end_s2d:
                    # region ends: spatial was already reduced 2x by the
                    # space-to-depth conv, so this block's stride folds in
                    stride = 1
                    s2d = False

                shortcut = x
                if bt == "cn":
                    y = conv(out_ch, b["k"], stride=stride, aa=self.aa,
                             name=f"{name}_conv")(x)
                    y = norm(act=bact, name=f"{name}_norm")(y)
                    if b.get("skip") and stride == 1 and in_ch == out_ch:
                        y = y + shortcut
                    x, in_ch = y, out_ch
                    bi += 1
                    continue

                if bt == "mqa" or bt == "mha":
                    y = norm(name=f"{name}_norm")(x)
                    if bt == "mqa":
                        y = _MultiQueryAttention2d(
                            out_ch, b["h"], b["kd"], b["kd"],
                            kv_stride=b.get("v", 1),
                            dw_kernel=b["k"] if isinstance(b["k"], int)
                            else b["k"][0],
                            norm_kind=self.norm, norm_eps=self.bn_eps,
                            deterministic=deterministic, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"{name}_attn")(y)
                    else:
                        y = _Attention2d(out_ch, b["h"], dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=f"{name}_attn")(y)
                    if self.layer_scale_init_value is not None:
                        g = self.param(
                            f"{name}_ls",
                            nn.initializers.constant(
                                self.layer_scale_init_value),
                            (out_ch,), self.param_dtype)
                        y = y * g.astype(y.dtype)
                    if stride == 1 and in_ch == out_ch \
                            and not b.get("noskip"):
                        rng = None if deterministic or dpr == 0 else \
                            self.make_rng("droppath")
                        y = shortcut + drop_path(y, dpr, deterministic, rng)
                    x, in_ch = y, out_ch
                    bi += 1
                    continue

                if bt == "uir":
                    mid = make_divisible(in_ch * b["e"])
                    y = x
                    if b["a"]:
                        a_stride = stride if not b["k"] else 1
                        y = conv(in_ch, b["a"], stride=a_stride,
                                 depthwise=True, aa=self.aa,
                                 name=f"{name}_dw_start")(y)
                        y = norm(name=f"{name}_dw_start_norm")(y)
                    y = conv(mid, 1, name=f"{name}_pw_exp")(y)
                    y = norm(act=bact, name=f"{name}_pw_exp_norm")(y)
                    if b["k"]:
                        y = conv(mid, b["k"], stride=stride, depthwise=True,
                                 aa=self.aa, name=f"{name}_dw_mid")(y)
                        y = norm(act=bact, name=f"{name}_dw_mid_norm")(y)
                    if b.get("se"):
                        rd = self._se_ch(mid, b["se"])
                        s = y.mean(axis=(1, 2), keepdims=True)
                        s = _act(self.se_force_act or bact)(
                            se_conv(rd, (1, 1), name=f"{name}_se_reduce")(s))
                        s = _act(self.se_gate)(
                            se_conv(mid, (1, 1), name=f"{name}_se_expand")(s))
                        y = y * s
                    y = conv(out_ch, 1, name=f"{name}_pw_proj")(y)
                    y = norm(name=f"{name}_pw_proj_norm")(y)
                    if b["p"]:
                        p_stride = stride if not b["a"] and not b["k"] else 1
                        y = conv(out_ch, b["p"], stride=p_stride,
                                 depthwise=True, name=f"{name}_dw_end")(y)
                        y = norm(name=f"{name}_dw_end_norm")(y)
                    if self.layer_scale_init_value is not None:
                        g = self.param(
                            f"{name}_ls",
                            nn.initializers.constant(
                                self.layer_scale_init_value),
                            (out_ch,), self.param_dtype)
                        y = y * g.astype(y.dtype)
                    if stride == 1 and in_ch == out_ch \
                            and not b.get("noskip"):
                        rng = None if deterministic or dpr == 0 else \
                            self.make_rng("droppath")
                        y = shortcut + drop_path(y, dpr, deterministic, rng)
                    x, in_ch = y, out_ch
                    bi += 1
                    continue

                # ir / ds / er share the SE + skip + s2d plumbing
                experts = b.get("cc", 0)
                routing = None
                if experts:
                    pooled = x.mean(axis=(1, 2))
                    routing = nn.sigmoid(nn.Dense(
                        experts, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"{name}_routing")(pooled))
                groups = 1
                if b.get("gs"):
                    pass  # resolved per-conv below
                y = x
                se_base = in_ch  # SE reduction base (input chs)
                if start_s2d:
                    y = conv(in_ch * 4, 2, stride=2,
                             name=f"{name}_s2d_conv")(y)
                    y = norm(name=f"{name}_s2d_norm")(y)
                    se_base = in_ch * 4
                    s2d_in = in_ch * 4
                else:
                    s2d_in = in_ch

                if bt == "ds":
                    mid = s2d_in
                    y = conv(mid, b["k"], stride=stride, depthwise=True,
                             aa=self.aa, experts=experts,
                             name=f"{name}_dw")(y, routing)
                    y = norm(act=bact, name=f"{name}_dw_norm")(y)
                    se_ratio = b.get("se", 0.0)
                elif bt == "ir":
                    e = b["e"] / 4 if end_s2d else b["e"]
                    mid = make_divisible(s2d_in * e)
                    y = conv(mid, b.get("a", 1), experts=experts,
                             name=f"{name}_pw_exp")(y, routing)
                    y = norm(act=bact, name=f"{name}_pw_exp_norm")(y)
                    if b.get("gs"):
                        groups = max(1, mid // b["gs"])
                        y = conv(mid, b["k"], stride=stride, groups=groups,
                                 aa=self.aa, experts=experts,
                                 name=f"{name}_dw")(y, routing)
                    else:
                        y = conv(mid, b["k"], stride=stride, depthwise=True,
                                 aa=self.aa, experts=experts,
                                 name=f"{name}_dw")(y, routing)
                    y = norm(act=bact, name=f"{name}_dw_norm")(y)
                    se_ratio = b.get("se", 0.0)
                    if se_ratio and not self.se_from_exp:
                        se_ratio /= b["e"]
                        se_base = mid
                else:  # er
                    fc = self._round(b["fc"]) if b.get("fc") else 0
                    mid = make_divisible((fc or s2d_in) * b["e"])
                    if b.get("gs"):
                        groups = max(1, mid // b["gs"])
                    y = conv(mid, b["k"], stride=stride, groups=groups,
                             aa=self.aa, name=f"{name}_conv_exp")(y)
                    y = norm(act=bact, name=f"{name}_conv_exp_norm")(y)
                    se_ratio = b.get("se", 0.0)
                    if se_ratio and not self.se_from_exp:
                        se_ratio /= b["e"]
                        se_base = mid

                if bt != "ir" and se_ratio and self.se_from_exp:
                    se_base = mid
                if se_ratio:
                    if start_s2d:
                        se_ratio /= 4
                    rd = self._se_ch(se_base, se_ratio)
                    if self.se_kind == "gc":
                        # GlobalContext attention (reference se_layer='gc'
                        # names): softmax-attn context pooling + channel-add
                        # MLP with LayerNorm bottleneck
                        w = se_conv(1, (1, 1), name=f"{name}_gc_attn")(y)
                        w = jax.nn.softmax(
                            w.reshape(w.shape[0], -1).astype(jnp.float32),
                            axis=-1).astype(y.dtype)
                        ctx = jnp.einsum(
                            "bl,blc->bc", w,
                            y.reshape(y.shape[0], -1, y.shape[-1]))
                        ctx = ctx[:, None, None, :]
                        s = se_conv(rd, (1, 1), name=f"{name}_gc_fc1")(ctx)
                        s = nn.LayerNorm(dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=f"{name}_gc_ln")(s)
                        s = se_conv(mid, (1, 1), name=f"{name}_gc_fc2")(
                            nn.relu(s))
                        y = y + s
                    else:
                        s = y.mean(axis=(1, 2), keepdims=True)
                        s = _act(self.se_force_act or bact)(
                            se_conv(rd, (1, 1), name=f"{name}_se_reduce")(s))
                        s = _act(self.se_gate)(
                            se_conv(mid, (1, 1),
                                    name=f"{name}_se_expand")(s))
                        y = y * s

                y = conv(out_ch, b.get("p", 1), experts=experts,
                         name=f"{name}_pw_proj")(y, routing)
                pw_act = bact if b.get("pw_act") else None
                y = norm(act=pw_act, name=f"{name}_pw_proj_norm")(y)

                if stride == 1 and in_ch == out_ch and not b.get("noskip") \
                        and not start_s2d:
                    rng = None if deterministic or dpr == 0 else \
                        self.make_rng("droppath")
                    y = shortcut + drop_path(y, dpr, deterministic, rng)
                x, in_ch = y, out_ch
                bi += 1
            stage_outs.append(x)
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)

        # ------------------------------------------------------------ head
        if self.head_style == "msfa":
            # MobileNetV5 multi-scale fusion adapter (mobilenetv5.py:26-114):
            # upsample selected stage outputs to the finest of them, concat,
            # UIR-style FFN to num_features, avg-pool to output_resolution,
            # RMS norm.
            feats = [stage_outs[i] for i in self.msfa_indices]
            hi = max(f.shape[1] for f in feats)
            resized = []
            for f in feats:
                if f.shape[1] < hi:
                    f = jax.image.resize(
                        f, (f.shape[0], hi, hi, f.shape[-1]), "nearest")
                resized.append(f)
            y = jnp.concatenate(resized, axis=-1)
            mid = make_divisible(y.shape[-1] * 2.0)
            y = conv(mid, 1, name="msfa_pw_exp")(y)
            y = _Norm(kind="rms", eps=self.bn_eps, act=self.act,
                      deterministic=deterministic, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="msfa_exp_norm")(y)
            y = conv(self.num_features, 1, name="msfa_pw_proj")(y)
            y = _Norm(kind="rms", eps=self.bn_eps,
                      deterministic=deterministic, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="msfa_proj_norm")(y)
            if y.shape[1] > self.msfa_output_resolution:
                w = y.shape[1] // self.msfa_output_resolution
                y = nn.avg_pool(y, (w, w), strides=(w, w))
            x = _Norm(kind="rms", eps=self.bn_eps,
                      deterministic=deterministic, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="msfa_norm")(y)
            x = x.mean(axis=(1, 2))
        elif self.head_style == "mnv3":
            # pool -> 1x1 conv (+ optional norm) -> act -> flatten
            x = x.mean(axis=(1, 2), keepdims=True)
            if self.num_features:
                x = conv(self.num_features, 1, bias=self.head_bias,
                         name="head_conv")(x)
                if self.head_norm:
                    x = norm(name="head_norm")(x)
                x = act(x)
            x = x[:, 0, 0]
        else:
            if self.num_features:
                x = conv(self.num_features, 1, name="head_conv")(x)
                x = norm(act=self.act, name="head_norm")(x)
            x = x.mean(axis=(1, 2))

        if self.drop_rate:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="classifier")(x).astype(jnp.float32)
