"""MaxxVit family (CoAtNet + MaxViT + MaxxViT) in Flax, NHWC.

Parity with the reference's dormant maxxvit.py (2638 LoC:
MaxxVitTransformerCfg/MaxxVitConvCfg/MaxxVitCfg :62-145, cfg generators
`_rw_coat_cfg`/`_rw_max_cfg`/`_next_cfg`/`_tf_cfg` :1507-1667, model_cfgs
:1668-2058, 56 registered names :2076+).  Stage grammar:

  C   MBConv (or ConvNeXt) convolution block
  T   CoAtNet transformer block: full 2-D attention w/ relative position
  M   MaxViT block: MBConv + window ("block") attention + strided
      ("grid") attention
  PM  parallel window+grid attention sharing one qkv projection

Relative position comes in three flavours matching the reference:
'bias' (Swin-style table), 'mlp' (coords -> MLP -> per-head bias), and
'bias_tf' (same table, TF layout — identical parameter count here).

TPU-native notes: partitioning is pure reshape/transpose; window size
derives from the traced input resolution (partition_ratio=32), so every
registered _224/_256/_384/_512 name compiles to a static graph at its
native size and any other divisible size.  Attention runs in bf16 with
fp32 softmax; rel-pos tables are gathered with host-precomputed numpy
indices (constant-folded by XLA).
"""
from __future__ import annotations

import sys
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.effnet_builder import (
    make_divisible,
)
from vision_transformers_torch_xla_tpu.models.layers import drop_path
from vision_transformers_torch_xla_tpu.models.registry import (
    register_deprecation,
    register_model,
)

__all__ = []


def _gelu_tanh(x):
    return nn.gelu(x, approximate=True)


_ACTS = {"gelu": nn.gelu, "gelu_tanh": _gelu_tanh, "silu": nn.silu,
         "relu": nn.relu}


def _block_partition(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, p * p, c)


def _block_merge(x, p, h, w):
    b = x.shape[0] // ((h // p) * (w // p))
    x = x.reshape(b, h // p, w // p, p, p, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _grid_partition(x, p):
    b, h, w, c = x.shape
    x = x.reshape(b, p, h // p, p, w // p, c)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, p * p, c)


def _grid_merge(x, p, h, w):
    b = x.shape[0] // ((h // p) * (w // p))
    x = x.reshape(b, h // p, w // p, p, p, -1)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, -1)


def _rel_index(h, w):
    """(h*w, h*w) indices into a (2h-1)*(2w-1) rel-pos table (numpy)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([yy.reshape(-1), xx.reshape(-1)])
    rel = coords[:, :, None] - coords[:, None, :]
    rel[0] += h - 1
    rel[1] += w - 1
    return rel[0] * (2 * w - 1) + rel[1]


class _RelPos(nn.Module):
    """Per-head relative position bias: table ('bias'/'bias_tf') or MLP
    ('mlp') over log-scaled coords (reference timm RelPosBias/RelPosMlp)."""
    num_heads: int
    mode: str = "bias"
    mlp_dim: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, w):
        idx = _rel_index(h, w)
        if self.mode in ("bias", "bias_tf"):
            table = self.param("rel_pos_table",
                               nn.initializers.normal(0.02),
                               ((2 * h - 1) * (2 * w - 1), self.num_heads),
                               self.param_dtype)
            bias = table[idx.reshape(-1)].reshape(h * w, h * w,
                                                  self.num_heads)
        else:  # mlp
            yy, xx = np.meshgrid(np.arange(-(h - 1), h),
                                 np.arange(-(w - 1), w), indexing="ij")
            coords = np.stack([yy, xx], axis=-1).reshape(-1, 2)
            coords = np.sign(coords) * np.log1p(np.abs(coords))
            coords = jnp.asarray(coords, dtype=self.param_dtype)
            hdim = self.mlp_dim
            y = nn.Dense(hdim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="fc1")(coords)
            y = nn.relu(y)
            table = nn.Dense(self.num_heads, use_bias=False,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="fc2")(y)
            bias = table[idx.reshape(-1)].reshape(h * w, h * w,
                                                  self.num_heads)
        return bias.transpose(2, 0, 1).astype(jnp.float32)  # (heads, N, N)


def _attn(q, k, v, bias=None):
    """(B, N, heads, hd) attention with fp32 softmax + optional rel bias."""
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, k)
    logits = logits.astype(jnp.float32)
    if bias is not None:
        logits = logits + bias[None]
    a = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


class _PartitionAttn(nn.Module):
    """Window ('block') or strided ('grid') partition attention with
    rel-pos, LayerScale, and MLP (reference PartitionAttentionCl)."""
    dim: int
    dim_head: int = 32
    grid: bool = False
    rel_pos: str = "bias"
    rel_pos_dim: int = 512
    init_values: Optional[float] = None
    expand_ratio: float = 4.0
    act: str = "gelu"
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, p, deterministic=True):
        b, hh, ww, c = x.shape
        heads = self.dim // self.dim_head
        part, merge = (_grid_partition, _grid_merge) if self.grid else \
            (_block_partition, _block_merge)
        ln = partial(nn.LayerNorm, epsilon=self.norm_eps, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        dense = partial(nn.Dense, dtype=self.dtype,
                        param_dtype=self.param_dtype)

        def ls(y, name):
            if self.init_values is None:
                return y
            g = self.param(name, nn.initializers.constant(self.init_values),
                           (c,), self.param_dtype)
            return y * g.astype(y.dtype)

        shortcut = x
        y = ln(name="norm1")(x)
        y = part(y, p)
        nb, n, _ = y.shape
        qkv = dense(3 * self.dim, name="qkv")(y)
        qkv = qkv.reshape(nb, n, 3, heads, self.dim_head)
        bias = _RelPos(heads, mode=self.rel_pos, mlp_dim=self.rel_pos_dim,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="rel_pos")(p, p)
        o = _attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias)
        o = o.reshape(nb, n, self.dim)
        o = dense(self.dim, name="proj")(o)
        o = merge(o, p, hh, ww)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(ls(o, "ls1"), self.drop_path_rate,
                                 deterministic, rng)

        y = ln(name="norm2")(x)
        hid = int(self.dim * self.expand_ratio)
        y = dense(hid, name="mlp_fc1")(y)
        y = _ACTS[self.act](y)
        y = dense(self.dim, name="mlp_fc2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(ls(y, "ls2"), self.drop_path_rate,
                             deterministic, rng)


class _ParallelPartitionAttn(nn.Module):
    """'PM' block (reference ParallelPartitionAttention): two separate
    half-width attentions over one shared norm — `attn_block` within
    windows and `attn_grid` across the grid, each with its own qkv
    (dim -> 3*dim/2) and proj (dim/2 -> dim/2) — outputs concatenated."""
    dim: int
    dim_head: int = 32
    rel_pos: str = "bias"
    rel_pos_dim: int = 512
    init_values: Optional[float] = None
    expand_ratio: float = 4.0
    act: str = "gelu"
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, p, deterministic=True):
        b, hh, ww, c = x.shape
        half = self.dim // 2
        ln = partial(nn.LayerNorm, epsilon=self.norm_eps, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        dense = partial(nn.Dense, dtype=self.dtype,
                        param_dtype=self.param_dtype)

        def ls(y, name):
            if self.init_values is None:
                return y
            g = self.param(name, nn.initializers.constant(self.init_values),
                           (c,), self.param_dtype)
            return y * g.astype(y.dtype)

        shortcut = x
        y = ln(name="norm1")(x)
        outs = []
        for pf, mf, nm in [(_block_partition, _block_merge, "win"),
                           (_grid_partition, _grid_merge, "grid")]:
            yp = pf(y, p)
            nb, n, _ = yp.shape
            hh2 = max(1, half // self.dim_head)
            hd = half // hh2
            qkv = dense(3 * half, name=f"qkv_{nm}")(yp)
            qkv = qkv.reshape(nb, n, 3, hh2, hd)
            bias = _RelPos(hh2, mode=self.rel_pos,
                           mlp_dim=self.rel_pos_dim, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"rel_pos_{nm}")(p, p)
            o = _attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias)
            o = dense(half, name=f"proj_{nm}")(o.reshape(nb, n, half))
            outs.append(mf(o, p, hh, ww))
        o = jnp.concatenate(outs, axis=-1)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(ls(o, "ls1"), self.drop_path_rate,
                                 deterministic, rng)
        y = ln(name="norm2")(x)
        hid = int(self.dim * self.expand_ratio)
        y = dense(hid, name="mlp_fc1")(y)
        y = _ACTS[self.act](y)
        y = dense(self.dim, name="mlp_fc2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(ls(y, "ls2"), self.drop_path_rate,
                             deterministic, rng)


class MaxxVit(nn.Module):
    """MaxxVit trunk (reference maxxvit.py MaxxVit :1850-2058)."""
    embed_dim: Tuple[int, ...] = (96, 192, 384, 768)
    depths: Tuple[int, ...] = (2, 3, 5, 2)
    block_type: Tuple = ("C", "C", "T", "T")
    stem_width: Any = 64
    stem_bias: bool = False
    head_hidden_size: Optional[int] = None
    # conv cfg
    conv_block: str = "mbconv"           # 'mbconv' | 'convnext'
    conv_expand: float = 4.0
    conv_expand_output: bool = True
    conv_pre_norm_act: bool = False
    conv_output_bias: bool = True
    conv_stride_mode: str = "dw"         # 'dw' | '1x1' | 'pool'
    conv_attn_early: bool = False
    conv_attn_ratio: float = 0.25
    conv_attn_act: str = "silu"
    conv_act: str = "gelu"
    conv_norm: str = "bn"                # 'bn' | 'ln'
    conv_norm_eps: Optional[float] = None  # None -> 1e-5 bn / 1e-6 ln
    conv_init_values: Optional[float] = 1e-6  # convnext layer scale
    # transformer cfg
    dim_head: int = 32
    expand_first: bool = True  # T-block channel expand in qkv vs out proj
    expand_ratio: float = 4.0
    rel_pos: str = "bias"
    rel_pos_dim: int = 512
    partition_ratio: int = 32
    window_size: Optional[int] = None
    no_block_attn: bool = False
    init_values: Optional[float] = None
    txf_act: str = "gelu"
    txf_norm: str = "ln2d"               # T-block norm: 'ln2d' | 'bn'
    txf_norm_eps: float = 1e-6
    txf_shortcut_bias: bool = True
    pool_type: str = "avg2"              # 'avg2' | 'max'
    num_classes: int = 1000
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    global_pool: str = "avg"
    img_size: int = 224
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def _norm(self, x, name, det, kind=None, eps=None):
        kind = kind or self.conv_norm
        if kind == "bn":
            return nn.BatchNorm(use_running_average=det, momentum=0.9,
                                epsilon=eps or self.conv_norm_eps or 1e-5,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)(x)
        return nn.LayerNorm(epsilon=eps or self.conv_norm_eps or 1e-6,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name=name)(x)

    def _pool2(self, x):
        """reference Downsample2d pool kinds (maxxvit.py:373-382):
        'avg2'/'max2' are 2x2 stride-2; 'avg'/'max' are 3x3 stride-2 pad 1
        (avg without counting the padding)."""
        if self.pool_type == "max":
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
        if self.pool_type == "max2":
            return nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.pool_type == "avg":
            return nn.avg_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)),
                               count_include_pad=False)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))

    def _mbconv(self, x, out, stride, name, det):
        """MBConv w/ pre-norm (reference MbConvBlock)."""
        conv = partial(nn.Conv, padding="SAME", dtype=self.dtype,
                       param_dtype=self.param_dtype)
        in_ch = x.shape[-1]
        mid = make_divisible(
            (out if self.conv_expand_output else in_ch) * self.conv_expand)
        act = _ACTS[self.conv_act]
        shortcut = x
        if stride > 1:
            # reference Downsample2d (maxxvit.py:384-387): pool always,
            # 1x1 expand conv ONLY when channels change
            shortcut = self._pool2(shortcut)
            if in_ch != out:
                shortcut = conv(out, (1, 1), use_bias=self.conv_output_bias,
                                name=f"{name}_short")(shortcut)
        y = self._norm(x, f"{name}_prenorm", det)
        if self.conv_pre_norm_act:
            y = act(y)
        if stride > 1 and self.conv_stride_mode == "pool":
            y = self._pool2(y)
            dw_stride = 1
            exp_stride = 1
        elif stride > 1 and self.conv_stride_mode == "1x1":
            dw_stride, exp_stride = 1, 2
        else:
            dw_stride, exp_stride = stride, 1
        y = conv(mid, (1, 1), strides=exp_stride, use_bias=False,
                 name=f"{name}_conv1")(y)
        y = act(self._norm(y, f"{name}_norm1", det))
        y = conv(mid, (3, 3), strides=dw_stride, feature_group_count=mid,
                 use_bias=False, name=f"{name}_conv2_dw")(y)
        # SE reduction base: out chs when expansion is output-relative,
        # else the expanded mid chs (reference MbConvBlock attn_kwargs)
        rd = make_divisible(
            self.conv_attn_ratio * (out if self.conv_expand_output
                                    else mid))
        if self.conv_attn_early:
            y = self._se(y, rd, f"{name}_se")
            y = act(self._norm(y, f"{name}_norm2", det))
        else:
            y = act(self._norm(y, f"{name}_norm2", det))
            y = self._se(y, rd, f"{name}_se")
        y = conv(out, (1, 1), use_bias=self.conv_output_bias,
                 name=f"{name}_conv3")(y)
        return shortcut, y

    def _se(self, y, rd, name):
        mid = y.shape[-1]
        se_conv = partial(nn.Conv, use_bias=True, dtype=self.dtype,
                          param_dtype=self.param_dtype)
        s = y.mean(axis=(1, 2), keepdims=True)
        s = _ACTS[self.conv_attn_act](
            se_conv(rd, (1, 1), name=f"{name}_fc1")(s))
        s = nn.sigmoid(se_conv(mid, (1, 1), name=f"{name}_fc2")(s))
        return y * s

    def _convnext(self, x, out, stride, name, det):
        """reference ConvNeXtBlock (maxxvit.py:655-715): shortcut from the
        ORIGINAL input (Downsample2d at stride 2, plain 1x1 conv on channel
        change, identity otherwise); main path is pool? -> depthwise
        in->out conv (channel multiplier) -> LN -> 1x1 mlp."""
        conv = partial(nn.Conv, padding="SAME", dtype=self.dtype,
                       param_dtype=self.param_dtype)
        in_ch = x.shape[-1]
        if stride > 1:
            shortcut = self._pool2(x)
            if in_ch != out:
                shortcut = conv(out, (1, 1), use_bias=self.conv_output_bias,
                                name=f"{name}_short")(shortcut)
        elif in_ch != out:
            shortcut = conv(out, (1, 1), use_bias=self.conv_output_bias,
                            name=f"{name}_short")(x)
        else:
            shortcut = x
        y = x
        if stride > 1 and self.conv_stride_mode == "pool":
            y = self._pool2(y)
            dw_stride = 1
        else:
            dw_stride = stride
        y = conv(out, (7, 7), strides=dw_stride, feature_group_count=in_ch,
                 use_bias=self.conv_output_bias, name=f"{name}_dw")(y)
        y = self._norm(y, f"{name}_norm", det, kind="ln")
        y = conv(int(out * self.conv_expand), (1, 1),
                 use_bias=self.conv_output_bias, name=f"{name}_mlp1")(y)
        y = _ACTS[self.conv_act](y)
        y = conv(out, (1, 1), use_bias=self.conv_output_bias,
                 name=f"{name}_mlp2")(y)
        if self.conv_init_values is not None:
            g = self.param(f"{name}_ls",
                           nn.initializers.constant(self.conv_init_values),
                           (out,), self.param_dtype)
            y = y * g.astype(y.dtype)
        return shortcut, y

    def _coat_txf(self, x, out, stride, name, det, dpr, deterministic):
        """CoAtNet 'T' transformer block (reference TransformerBlock2d):
        full 2-D attention with rel-pos over the stage feature map."""
        dense = partial(nn.Dense, dtype=self.dtype,
                        param_dtype=self.param_dtype)
        shortcut = x
        if stride > 1:
            # reference TransformerBlock2d shortcut = Downsample2d
            # (maxxvit.py:453-455): expand conv only on channel change
            shortcut = self._pool2(shortcut)
            if x.shape[-1] != out:
                shortcut = dense(out, use_bias=self.txf_shortcut_bias,
                                 name=f"{name}_short")(shortcut)
        y = self._norm(x, f"{name}_norm1", det,
                       kind="bn" if self.txf_norm == "bn" else "ln",
                       eps=self.txf_norm_eps)
        if stride > 1:
            y = self._pool2(y)
        b, hh, ww, _ = y.shape
        # reference Attention2d (maxxvit.py:177-187): dim_attn = dim_out
        # when expand_first else dim (rw models expand via the out proj)
        dim_attn = out if self.expand_first else y.shape[-1]
        heads = dim_attn // self.dim_head
        qkv = dense(3 * dim_attn,
                    name=f"{name}_qkv")(y.reshape(b, hh * ww, -1))
        qkv = qkv.reshape(b, hh * ww, 3, heads, self.dim_head)
        bias = _RelPos(heads, mode=self.rel_pos, mlp_dim=self.rel_pos_dim,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name=f"{name}_rel_pos")(hh, ww)
        o = _attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias)
        o = dense(out, name=f"{name}_proj")(o.reshape(b, hh * ww, dim_attn))
        o = o.reshape(b, hh, ww, out)
        if self.init_values is not None:
            g = self.param(f"{name}_ls1",
                           nn.initializers.constant(self.init_values),
                           (out,), self.param_dtype)
            o = o * g.astype(o.dtype)
        rng = None if deterministic or dpr == 0 else \
            self.make_rng("droppath")
        x = shortcut + drop_path(o, dpr, deterministic, rng)
        y = self._norm(x, f"{name}_norm2", det,
                       kind="bn" if self.txf_norm == "bn" else "ln",
                       eps=self.txf_norm_eps)
        y = dense(int(out * self.expand_ratio), name=f"{name}_mlp1")(y)
        y = _ACTS[self.txf_act](y)
        y = dense(out, name=f"{name}_mlp2")(y)
        if self.init_values is not None:
            g = self.param(f"{name}_ls2",
                           nn.initializers.constant(self.init_values),
                           (out,), self.param_dtype)
            y = y * g.astype(y.dtype)
        rng = None if deterministic or dpr == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, dpr, deterministic, rng)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        conv = partial(nn.Conv, padding="SAME", dtype=self.dtype,
                       param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        in_h = x.shape[1]
        p_cfg = self.window_size or max(1, in_h // self.partition_ratio)

        sw = self.stem_width
        if not isinstance(sw, (tuple, list)):
            sw = (sw, sw)
        x = conv(sw[0], (3, 3), strides=2, use_bias=self.stem_bias,
                 name="stem_conv1")(x)
        x = self._norm(x, "stem_norm1", det)
        x = _ACTS[self.conv_act](x)
        x = conv(sw[1], (3, 3), use_bias=self.stem_bias,
                 name="stem_conv2")(x)

        total = sum(self.depths) or 1
        dprs = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for si, (dim, depth) in enumerate(zip(self.embed_dim, self.depths)):
            bt = self.block_type[si]
            for bj in range(depth):
                stride = 2 if bj == 0 else 1
                this_bt = bt[bj % len(bt)] if isinstance(bt, tuple) else bt
                name = f"s{si}_b{bj}"
                dpr = float(dprs[bi])
                if this_bt in ("C", "M", "PM"):
                    blk = self._convnext if self.conv_block == "convnext" \
                        else self._mbconv
                    shortcut, y = blk(x, dim, stride, f"{name}_conv", det)
                    rng = None if det or dpr == 0 else \
                        self.make_rng("droppath")
                    x = shortcut + drop_path(y, dpr, det, rng)
                    p = min(p_cfg, x.shape[1])
                    if this_bt == "M":
                        if not self.no_block_attn:
                            x = _PartitionAttn(
                                dim, self.dim_head, grid=False,
                                rel_pos=self.rel_pos,
                                rel_pos_dim=self.rel_pos_dim,
                                init_values=self.init_values,
                                expand_ratio=self.expand_ratio,
                                act=self.txf_act, drop_path_rate=dpr,
                                norm_eps=self.txf_norm_eps,
                                dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name=f"{name}_win")(x, p, det)
                        x = _PartitionAttn(
                            dim, self.dim_head, grid=True,
                            rel_pos=self.rel_pos,
                            rel_pos_dim=self.rel_pos_dim,
                            init_values=self.init_values,
                            expand_ratio=self.expand_ratio,
                            act=self.txf_act, drop_path_rate=dpr,
                            norm_eps=self.txf_norm_eps,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"{name}_grid")(x, p, det)
                    elif this_bt == "PM":
                        x = _ParallelPartitionAttn(
                            dim, self.dim_head, rel_pos=self.rel_pos,
                            rel_pos_dim=self.rel_pos_dim,
                            init_values=self.init_values,
                            expand_ratio=self.expand_ratio,
                            act=self.txf_act, drop_path_rate=dpr,
                            norm_eps=self.txf_norm_eps,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"{name}_pm")(x, p, det)
                else:  # 'T'
                    x = self._coat_txf(x, dim, stride, name, det, dpr, det)
                bi += 1
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)

        if self.head_hidden_size:
            x = x.mean(axis=(1, 2))
            x = nn.LayerNorm(epsilon=self.txf_norm_eps, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="head_norm")(x)
            x = nn.Dense(self.head_hidden_size, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="head_pre_logits")(x)
            x = jnp.tanh(x)
        else:
            x = nn.LayerNorm(epsilon=self.txf_norm_eps, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="final_norm")(x)
            x = x.mean(axis=(1, 2))
        if self.drop_rate:
            x = nn.Dropout(self.drop_rate)(x, deterministic=det)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="classifier")(x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# cfg generators (reference maxxvit.py:1507-1667)
# ---------------------------------------------------------------------------

def _rw_coat(stride_mode="pool", pool_type="avg2", conv_output_bias=False,
             conv_attn_early=False, conv_attn_act="relu",
             txf_shortcut_bias=True, init_values=None, rel_pos="bias",
             rel_pos_dim=512, txf_norm="ln2d"):
    return dict(conv_stride_mode=stride_mode, pool_type=pool_type,
                conv_pre_norm_act=True, conv_expand_output=False,
                conv_output_bias=conv_output_bias,
                conv_attn_early=conv_attn_early,
                conv_attn_act=conv_attn_act, conv_act="silu",
                expand_first=False, txf_shortcut_bias=txf_shortcut_bias,
                init_values=init_values, rel_pos=rel_pos,
                rel_pos_dim=rel_pos_dim, txf_norm=txf_norm)


def _rw_max(stride_mode="dw", pool_type="avg2", conv_output_bias=False,
            conv_attn_ratio=1 / 16, window_size=None, dim_head=32,
            init_values=None, rel_pos="bias", rel_pos_dim=512):
    return dict(conv_stride_mode=stride_mode, pool_type=pool_type,
                conv_expand_output=False,
                conv_output_bias=conv_output_bias,
                conv_attn_ratio=conv_attn_ratio, conv_act="silu",
                expand_first=False,
                window_size=window_size, dim_head=dim_head,
                init_values=init_values, rel_pos=rel_pos,
                rel_pos_dim=rel_pos_dim)


def _next(stride_mode="dw", pool_type="avg2", window_size=None,
          no_block_attn=False, init_values=(1e-6, 1e-6), rel_pos="mlp",
          rel_pos_dim=512):
    return dict(conv_block="convnext", conv_stride_mode=stride_mode,
                pool_type=pool_type, conv_expand_output=False,
                conv_init_values=init_values[0], conv_norm="ln",
                expand_first=False,
                window_size=window_size, no_block_attn=no_block_attn,
                init_values=init_values[1], rel_pos=rel_pos,
                rel_pos_dim=rel_pos_dim)


def _tf():
    # reference _tf_cfg (maxxvit.py:1651-1666): conv BN eps 1e-3,
    # transformer LN eps 1e-5
    return dict(conv_act="gelu_tanh", txf_act="gelu_tanh",
                rel_pos="bias_tf", conv_norm_eps=1e-3, txf_norm_eps=1e-5)


_M4 = dict(block_type=("M",) * 4)

CFGS = {
    "coatnet_pico_rw": dict(embed_dim=(64, 128, 256, 512),
                            depths=(2, 3, 5, 2), stem_width=(32, 64),
                            **_rw_max(conv_output_bias=True,
                                      conv_attn_ratio=0.25)),
    "coatnet_nano_rw": dict(embed_dim=(64, 128, 256, 512),
                            depths=(3, 4, 6, 3), stem_width=(32, 64),
                            **_rw_max(stride_mode="pool",
                                      conv_output_bias=True,
                                      conv_attn_ratio=0.25)),
    "coatnet_0_rw": dict(embed_dim=(96, 192, 384, 768),
                         depths=(2, 3, 7, 2), stem_width=(32, 64),
                         **_rw_coat(conv_attn_early=True)),
    "coatnet_1_rw": dict(embed_dim=(96, 192, 384, 768),
                         depths=(2, 6, 14, 2), stem_width=(32, 64),
                         **_rw_coat(stride_mode="dw",
                                    conv_attn_early=True)),
    "coatnet_2_rw": dict(embed_dim=(128, 256, 512, 1024),
                         depths=(2, 6, 14, 2), stem_width=(64, 128),
                         **_rw_coat(stride_mode="dw",
                                    conv_attn_act="silu")),
    "coatnet_3_rw": dict(embed_dim=(192, 384, 768, 1536),
                         depths=(2, 6, 14, 2), stem_width=(96, 192),
                         **_rw_coat(stride_mode="dw",
                                    conv_attn_act="silu",
                                    init_values=1e-6)),
    "coatnet_bn_0_rw": dict(embed_dim=(96, 192, 384, 768),
                            depths=(2, 3, 7, 2), stem_width=(32, 64),
                            **_rw_coat(stride_mode="dw",
                                       conv_attn_early=True,
                                       txf_norm="bn")),
    "coatnet_rmlp_nano_rw": dict(embed_dim=(64, 128, 256, 512),
                                 depths=(3, 4, 6, 3), stem_width=(32, 64),
                                 **_rw_max(conv_output_bias=True,
                                           conv_attn_ratio=0.25,
                                           rel_pos="mlp",
                                           rel_pos_dim=384)),
    "coatnet_rmlp_0_rw": dict(embed_dim=(96, 192, 384, 768),
                              depths=(2, 3, 7, 2), stem_width=(32, 64),
                              **_rw_coat(stride_mode="dw",
                                         rel_pos="mlp")),
    "coatnet_rmlp_1_rw": dict(embed_dim=(96, 192, 384, 768),
                              depths=(2, 6, 14, 2), stem_width=(32, 64),
                              **_rw_coat(pool_type="max",
                                         conv_attn_early=True,
                                         txf_shortcut_bias=False,
                                         rel_pos="mlp",
                                         rel_pos_dim=384)),
    "coatnet_rmlp_1_rw2": dict(embed_dim=(96, 192, 384, 768),
                               depths=(2, 6, 14, 2), stem_width=(32, 64),
                               **_rw_coat(stride_mode="dw",
                                          rel_pos="mlp",
                                          rel_pos_dim=512)),
    "coatnet_rmlp_2_rw": dict(embed_dim=(128, 256, 512, 1024),
                              depths=(2, 6, 14, 2), stem_width=(64, 128),
                              **_rw_coat(stride_mode="dw",
                                         conv_attn_act="silu",
                                         init_values=1e-6,
                                         rel_pos="mlp")),
    "coatnet_rmlp_3_rw": dict(embed_dim=(192, 384, 768, 1536),
                              depths=(2, 6, 14, 2), stem_width=(96, 192),
                              **_rw_coat(stride_mode="dw",
                                         conv_attn_act="silu",
                                         init_values=1e-6,
                                         rel_pos="mlp")),
    "coatnet_nano_cc": dict(embed_dim=(64, 128, 256, 512),
                            depths=(3, 4, 6, 3), stem_width=(32, 64),
                            block_type=("C", "C", ("C", "T"), ("C", "T")),
                            **_rw_coat()),
    "coatnext_nano_rw": dict(embed_dim=(64, 128, 256, 512),
                             depths=(3, 4, 6, 3), stem_width=(32, 64),
                             **_next(rel_pos="bias",
                                     init_values=(1e-5, None))),
    "coatnet_0": dict(embed_dim=(96, 192, 384, 768), depths=(2, 3, 5, 2),
                      stem_width=64, head_hidden_size=768),
    "coatnet_1": dict(embed_dim=(96, 192, 384, 768), depths=(2, 6, 14, 2),
                      stem_width=64, head_hidden_size=768),
    "coatnet_2": dict(embed_dim=(128, 256, 512, 1024),
                      depths=(2, 6, 14, 2), stem_width=128,
                      head_hidden_size=1024),
    "coatnet_3": dict(embed_dim=(192, 384, 768, 1536),
                      depths=(2, 6, 14, 2), stem_width=192,
                      head_hidden_size=1536),
    "coatnet_4": dict(embed_dim=(192, 384, 768, 1536),
                      depths=(2, 12, 28, 2), stem_width=192,
                      head_hidden_size=1536),
    "coatnet_5": dict(embed_dim=(256, 512, 1280, 2048),
                      depths=(2, 12, 28, 2), stem_width=192,
                      head_hidden_size=2048),
    "maxvit_pico_rw": dict(embed_dim=(32, 64, 128, 256),
                           depths=(2, 2, 5, 2), stem_width=(24, 32),
                           **_M4, **_rw_max()),
    "maxvit_nano_rw": dict(embed_dim=(64, 128, 256, 512),
                           depths=(1, 2, 3, 1), stem_width=(32, 64),
                           **_M4, **_rw_max()),
    "maxvit_tiny_rw": dict(embed_dim=(64, 128, 256, 512),
                           depths=(2, 2, 5, 2), stem_width=(32, 64),
                           **_M4, **_rw_max()),
    "maxvit_tiny_pm": dict(embed_dim=(64, 128, 256, 512),
                           depths=(2, 2, 5, 2), stem_width=(32, 64),
                           block_type=("PM",) * 4, **_rw_max()),
    "maxvit_rmlp_pico_rw": dict(embed_dim=(32, 64, 128, 256),
                                depths=(2, 2, 5, 2), stem_width=(24, 32),
                                **_M4, **_rw_max(rel_pos="mlp")),
    "maxvit_rmlp_nano_rw": dict(embed_dim=(64, 128, 256, 512),
                                depths=(1, 2, 3, 1), stem_width=(32, 64),
                                **_M4, **_rw_max(rel_pos="mlp")),
    "maxvit_rmlp_tiny_rw": dict(embed_dim=(64, 128, 256, 512),
                                depths=(2, 2, 5, 2), stem_width=(32, 64),
                                **_M4, **_rw_max(rel_pos="mlp")),
    "maxvit_rmlp_small_rw": dict(embed_dim=(96, 192, 384, 768),
                                 depths=(2, 2, 5, 2), stem_width=(32, 64),
                                 **_M4, **_rw_max(rel_pos="mlp",
                                                  init_values=1e-6)),
    "maxvit_rmlp_base_rw": dict(embed_dim=(96, 192, 384, 768),
                                depths=(2, 6, 14, 2), stem_width=(32, 64),
                                head_hidden_size=768, **_M4,
                                **_rw_max(rel_pos="mlp")),
    "maxxvit_rmlp_nano_rw": dict(embed_dim=(64, 128, 256, 512),
                                 depths=(1, 2, 3, 1), stem_width=(32, 64),
                                 **_M4, **_next()),
    "maxxvit_rmlp_tiny_rw": dict(embed_dim=(64, 128, 256, 512),
                                 depths=(2, 2, 5, 2), stem_width=(32, 64),
                                 **_M4, **_next()),
    "maxxvit_rmlp_small_rw": dict(embed_dim=(96, 192, 384, 768),
                                  depths=(2, 2, 5, 2), stem_width=(48, 96),
                                  **_M4, **_next()),
    "maxxvitv2_nano_rw": dict(embed_dim=(96, 192, 384, 768),
                              depths=(1, 2, 3, 1), stem_width=(48, 96),
                              **_M4, **_next(no_block_attn=True,
                                             rel_pos="bias")),
    "maxxvitv2_rmlp_base_rw": dict(embed_dim=(128, 256, 512, 1024),
                                   depths=(2, 6, 12, 2),
                                   stem_width=(64, 128), **_M4,
                                   **_next(no_block_attn=True)),
    "maxxvitv2_rmlp_large_rw": dict(embed_dim=(160, 320, 640, 1280),
                                    depths=(2, 6, 16, 2),
                                    stem_width=(80, 160),
                                    head_hidden_size=1280, **_M4,
                                    **_next(no_block_attn=True)),
    "maxvit_tiny_tf": dict(embed_dim=(64, 128, 256, 512),
                           depths=(2, 2, 5, 2), stem_width=64,
                           stem_bias=True, head_hidden_size=512, **_M4,
                           **_tf()),
    "maxvit_small_tf": dict(embed_dim=(96, 192, 384, 768),
                            depths=(2, 2, 5, 2), stem_width=64,
                            stem_bias=True, head_hidden_size=768, **_M4,
                            **_tf()),
    "maxvit_base_tf": dict(embed_dim=(96, 192, 384, 768),
                           depths=(2, 6, 14, 2), stem_width=64,
                           stem_bias=True, head_hidden_size=768, **_M4,
                           **_tf()),
    "maxvit_large_tf": dict(embed_dim=(128, 256, 512, 1024),
                            depths=(2, 6, 14, 2), stem_width=128,
                            stem_bias=True, head_hidden_size=1024, **_M4,
                            **_tf()),
    "maxvit_xlarge_tf": dict(embed_dim=(192, 384, 768, 1536),
                             depths=(2, 6, 14, 2), stem_width=192,
                             stem_bias=True, head_hidden_size=1536, **_M4,
                             **_tf()),
}

# registered name -> (cfg, native img size); reference maxxvit.py:2076+
_NAMES = (
    [(f"coatnet_{v}_rw_224", f"coatnet_{v}_rw", 224)
     for v in ("pico", "nano", "0", "1", "2", "3", "bn_0")]
    + [(f"coatnet_rmlp_{v}_rw_224", f"coatnet_rmlp_{v}_rw", 224)
       for v in ("nano", "0", "1", "2", "3")]
    + [("coatnet_rmlp_1_rw2_224", "coatnet_rmlp_1_rw2", 224),
       ("coatnet_rmlp_2_rw_384", "coatnet_rmlp_2_rw", 384),
       ("coatnet_nano_cc_224", "coatnet_nano_cc", 224),
       ("coatnext_nano_rw_224", "coatnext_nano_rw", 224)]
    + [(f"coatnet_{i}_224", f"coatnet_{i}", 224) for i in range(6)]
    + [("maxvit_pico_rw_256", "maxvit_pico_rw", 256),
       ("maxvit_nano_rw_256", "maxvit_nano_rw", 256),
       ("maxvit_tiny_rw_224", "maxvit_tiny_rw", 224),
       ("maxvit_tiny_rw_256", "maxvit_tiny_rw", 256),
       ("maxvit_tiny_pm_256", "maxvit_tiny_pm", 256),
       ("maxvit_rmlp_pico_rw_256", "maxvit_rmlp_pico_rw", 256),
       ("maxvit_rmlp_nano_rw_256", "maxvit_rmlp_nano_rw", 256),
       ("maxvit_rmlp_tiny_rw_256", "maxvit_rmlp_tiny_rw", 256),
       ("maxvit_rmlp_small_rw_224", "maxvit_rmlp_small_rw", 224),
       ("maxvit_rmlp_small_rw_256", "maxvit_rmlp_small_rw", 256),
       ("maxvit_rmlp_base_rw_224", "maxvit_rmlp_base_rw", 224),
       ("maxvit_rmlp_base_rw_384", "maxvit_rmlp_base_rw", 384),
       ("maxxvit_rmlp_nano_rw_256", "maxxvit_rmlp_nano_rw", 256),
       ("maxxvit_rmlp_tiny_rw_256", "maxxvit_rmlp_tiny_rw", 256),
       ("maxxvit_rmlp_small_rw_256", "maxxvit_rmlp_small_rw", 256),
       ("maxxvitv2_nano_rw_256", "maxxvitv2_nano_rw", 256),
       ("maxxvitv2_rmlp_base_rw_224", "maxxvitv2_rmlp_base_rw", 224),
       ("maxxvitv2_rmlp_base_rw_384", "maxxvitv2_rmlp_base_rw", 384),
       ("maxxvitv2_rmlp_large_rw_224", "maxxvitv2_rmlp_large_rw", 224)]
    + [(f"maxvit_{s}_tf_{r}", f"maxvit_{s}_tf", r)
       for s in ("tiny", "small", "base", "large", "xlarge")
       for r in (224, 384, 512)]
)


def _maxxvit(cfg_name: str, img_size: int):
    cfg = CFGS[cfg_name]

    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        merged = dict(cfg, img_size=img_size)
        merged.update(kw)
        return MaxxVit(**merged)

    return build


_mod = sys.modules[__name__]
for _name, _cfg_name, _size in _NAMES:
    _fn = _maxxvit(_cfg_name, _size)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MaxxVit variant {_name!r} (reference maxxvit.py "
                   f"registry surface, cfg {_cfg_name!r}).")
    setattr(_mod, _name, register_model(_fn))

# round-2 carried two invented names with no reference counterpart;
# alias them to the closest real configs with a deprecation warning
register_deprecation("maxvit_tiny_224", "maxvit_tiny_tf_224")
register_deprecation("maxvit_small_224", "maxvit_small_tf_224")
