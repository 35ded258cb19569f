"""HRNet in Flax, NHWC.

Parity with the reference's dormant hrnet.py (978 LoC; SURVEY §2.2):
multi-resolution parallel branches — a bottleneck stage-1 trunk, then
three stages of HighResolutionModules whose branches run basic blocks at
1x/2x/4x/8x strides and exchange information through fuse layers
(strided 3x3 chains downward, 1x1 + nearest-upsample upward, summed with
ReLU), plus the classification head that re-expands each branch through
a bottleneck (32/64/128/256 x4), cascades stride-2 downsample convs, and
finishes with a 2048-wide 1x1.

The branch topology is static per config, so the whole exchange graph
unrolls into one XLA program; upsampling is `jax.image.resize` nearest
(constant-folded scale factors).
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


class _CBA(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k), strides=self.stride,
                    padding=((k // 2, k // 2),) * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class _Basic(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        shortcut = x
        if x.shape[-1] != self.features:
            shortcut = _CBA(self.features, 1, act=False, name="down",
                            **p)(x, deterministic)
        y = _CBA(self.features, 3, name="c1", **p)(x, deterministic)
        y = _CBA(self.features, 3, act=False, name="c2",
                 **p)(y, deterministic)
        return nn.relu(y + shortcut)


class _Bottle(nn.Module):
    features: int          # mid width; output = 4x
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out = self.features * 4
        shortcut = x
        if x.shape[-1] != out:
            shortcut = _CBA(out, 1, act=False, name="down",
                            **p)(x, deterministic)
        y = _CBA(self.features, 1, name="c1", **p)(x, deterministic)
        y = _CBA(self.features, 3, name="c2", **p)(y, deterministic)
        y = _CBA(out, 1, act=False, name="c3", **p)(y, deterministic)
        return nn.relu(y + shortcut)


class HRNet(nn.Module):
    stem_width: int = 64
    stage1_blocks: int = 4
    stage1_width: int = 64
    # (num_modules, num_blocks_per_branch, channels) per stage 2..4
    stage_cfgs: Tuple = ((1, 2, (18, 36)),
                         (4, 4, (18, 36, 72)),
                         (3, 4, (18, 36, 72, 144)))
    head_channels: Tuple[int, ...] = (32, 64, 128, 256)
    num_classes: int = 1000
    img_size: int = 224
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        x = _CBA(self.stem_width, 3, 2, name="stem1", **p)(x, det)
        x = _CBA(self.stem_width, 3, 2, name="stem2", **p)(x, det)
        for bi in range(self.stage1_blocks):
            x = _Bottle(self.stage1_width, name=f"layer1_{bi}",
                        **p)(x, det)

        branches = [x]
        for si, (modules, blocks, chs) in enumerate(self.stage_cfgs):
            # transition: adapt existing branches, spawn one new
            new_branches = []
            for bi, c in enumerate(chs):
                if bi < len(branches):
                    src = branches[bi]
                    if src.shape[-1] != c:
                        src = _CBA(c, 3, name=f"t{si}_b{bi}",
                                   **p)(src, det)
                    new_branches.append(src)
                else:
                    new_branches.append(
                        _CBA(c, 3, 2, name=f"t{si}_b{bi}",
                             **p)(branches[-1], det))
            branches = new_branches
            for mi in range(modules):
                # branch blocks
                branches = [
                    self._run_branch(b, blocks, chs[bi],
                                     f"s{si}_m{mi}_br{bi}", det)
                    for bi, b in enumerate(branches)]
                # fuse
                fused = []
                for i in range(len(branches)):
                    acc = None
                    for j, bj in enumerate(branches):
                        y = bj
                        nm = f"s{si}_m{mi}_f{i}_{j}"
                        if j > i:
                            y = _CBA(chs[i], 1, act=False, name=nm,
                                     **p)(y, det)
                            tgt = branches[i].shape
                            y = jax.image.resize(
                                y, (y.shape[0], tgt[1], tgt[2],
                                    y.shape[-1]), "nearest")
                        elif j < i:
                            for step in range(i - j):
                                last = step == i - j - 1
                                y = _CBA(chs[i] if last else chs[j], 3, 2,
                                         act=not last,
                                         name=f"{nm}_d{step}",
                                         **p)(y, det)
                        acc = y if acc is None else acc + y
                    fused.append(nn.relu(acc))
                branches = fused

        # classification head (reference hrnet.py head path)
        y = None
        for i, b in enumerate(branches):
            h = _Bottle(self.head_channels[i], name=f"incre{i}",
                        **p)(b, det)
            if y is not None:
                y = h + _CBA(self.head_channels[i] * 4, 3, 2,
                             name=f"down{i}", **p)(y, det)
            else:
                y = h
        y = _CBA(2048, 1, name="final_conv", **p)(y, det)
        y = y.mean(axis=(1, 2))
        if self.num_classes == 0:
            return y
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(y).astype(jnp.float32)

    def _run_branch(self, x, blocks, ch, nm, det):
        for k in range(blocks):
            x = _Basic(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                       name=f"{nm}_blk{k}")(x, det)
        return x


def _hrnet(stage1_blocks, stage1_width, stage_cfgs):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "drop_path_rate"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        kw.setdefault("stage1_blocks", stage1_blocks)
        kw.setdefault("stage1_width", stage1_width)
        kw.setdefault("stage_cfgs", stage_cfgs)
        return HRNet(**kw)

    return build


def _w(c):
    return ((1, 4, (c, 2 * c)), (4, 4, (c, 2 * c, 4 * c)),
            (3, 4, (c, 2 * c, 4 * c, 8 * c)))


_V = {
    "hrnet_w18_small": _hrnet(1, 32, ((1, 2, (16, 32)),
                                      (1, 2, (16, 32, 64)),
                                      (1, 2, (16, 32, 64, 128)))),
    "hrnet_w18_small_v2": _hrnet(2, 64, ((1, 2, (18, 36)),
                                         (3, 2, (18, 36, 72)),
                                         (2, 2, (18, 36, 72, 144)))),
    "hrnet_w18": _hrnet(4, 64, _w(18)),
    "hrnet_w18_ssld": _hrnet(4, 64, _w(18)),
    "hrnet_w30": _hrnet(4, 64, _w(30)),
    "hrnet_w32": _hrnet(4, 64, _w(32)),
    "hrnet_w40": _hrnet(4, 64, _w(40)),
    "hrnet_w44": _hrnet(4, 64, _w(44)),
    "hrnet_w48": _hrnet(4, 64, _w(48)),
    "hrnet_w48_ssld": _hrnet(4, 64, _w(48)),
    "hrnet_w64": _hrnet(4, 64, _w(64)),
}

_mod = sys.modules[__name__]
for _name, _fn in _V.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"HRNet variant {_name!r} (reference hrnet.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
