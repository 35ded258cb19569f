"""CSPNet / DarkNet in Flax, NHWC.

Parity with the reference's dormant cspnet.py core surface (1114 LoC;
SURVEY §2.2): cross-stage-partial stages — downsample, 1x1 expansion
split in two, one half through ResNe(X)t bottleneck or DarkNet blocks,
per-path transition then joint 1x1 transition (reference
cspnet.py:266-342) — plus plain DarkNet stages. Covers the classic
cspresnet50(d), cspresnext50, cspdarknet53, darknet53 names (the
reference's long tail of config permutations is intentionally left
out).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ConvBnAct(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    silu: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        if not self.act:
            return x
        return nn.silu(x) if self.silu else nn.leaky_relu(x, 0.01)


class _Bottleneck(nn.Module):
    out_chs: int
    bottle_ratio: float = 0.25
    groups: int = 1
    silu: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = int(round(self.out_chs * self.bottle_ratio))
        p = dict(silu=self.silu, dtype=self.dtype,
                 param_dtype=self.param_dtype)
        y = _ConvBnAct(mid, 1, name="conv1", **p)(x, deterministic)
        y = _ConvBnAct(mid, 3, groups=self.groups, name="conv2",
                       **p)(y, deterministic)
        y = _ConvBnAct(self.out_chs, 1, act=False, name="conv3",
                       **p)(y, deterministic)
        return nn.leaky_relu(y + x, 0.01)


class _DarkBlock(nn.Module):
    out_chs: int
    bottle_ratio: float = 0.5
    groups: int = 1
    attn: str = ""
    attn_ratio: float = 1 / 16
    edge: bool = False   # edge block: 3x3 first, 1x1 second
    silu: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = int(round(self.out_chs * self.bottle_ratio))
        p = dict(silu=self.silu, dtype=self.dtype,
                 param_dtype=self.param_dtype)
        if self.edge:
            y = _ConvBnAct(mid, 3, groups=self.groups, name="conv1",
                           **p)(x, deterministic)
        else:
            y = _ConvBnAct(mid, 1, name="conv1", **p)(x, deterministic)
        if self.attn == "se":
            rd = max(8, int(mid * self.attn_ratio))
            s = y.mean(axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(rd, (1, 1), dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="se_fc1")(s))
            s = nn.sigmoid(nn.Conv(mid, (1, 1), dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name="se_fc2")(s))
            y = y * s
        if self.edge:
            y = _ConvBnAct(self.out_chs, 1, name="conv2",
                           **p)(y, deterministic)
        else:
            y = _ConvBnAct(self.out_chs, 3, groups=self.groups,
                           name="conv2", **p)(y, deterministic)
        return y + x


class CspNet(nn.Module):
    """Reference cspnet.py:880-1000 (CspNet)."""

    num_classes: int = 1000
    stem_chs: Sequence[int] = (64,)
    stem_kernel: int = 7
    stem_pool: bool = True
    depths: Sequence[int] = (3, 3, 5, 2)
    out_chs: Sequence[int] = (128, 256, 512, 1024)
    strides: Sequence[int] = (1, 2, 2, 2)
    expand_ratio: float = 2.0
    bottle_ratio: float = 0.5
    block_ratio: float = 1.0
    groups: Sequence[int] = (1,)       # per-stage (broadcast if len 1)
    cross: bool = True                 # CSP split vs plain dark stage
    stage_type: str = "csp"            # 'csp' | 'cs3' | 'dark'
    block_type: str = "bottleneck"     # 'bottleneck' | 'dark' | 'edge'
    down_growth: bool = False
    avg_down: bool = False
    attn: str = ""
    attn_ratio: float = 1 / 16
    act: str = "leaky"                 # 'leaky' | 'silu'
    focus: bool = False                # 6x6/s2 focus stem (cs3 focus)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        silu = self.act == "silu"
        p = dict(silu=silu, dtype=self.dtype,
                 param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.focus:
            # YOLOv5-style focus stem: one 6x6/s2 conv
            x = _ConvBnAct(self.stem_chs[0], 6, 2, name="stem_0",
                           **p)(x, det)
        else:
            for i, c in enumerate(self.stem_chs):
                s = 2 if i == 0 else 1
                x = _ConvBnAct(c, self.stem_kernel
                               if len(self.stem_chs) == 1 else 3, s,
                               name=f"stem_{i}", **p)(x, det)
        if self.stem_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        block_cls = (_Bottleneck if self.block_type == "bottleneck"
                     else _DarkBlock)
        g_cfg = ((self.groups,) if isinstance(self.groups, int)
                 else tuple(self.groups))
        groups = g_cfg if len(g_cfg) > 1 else g_cfg * len(self.depths)
        for si, depth in enumerate(self.depths):
            out = self.out_chs[si]
            g = groups[si]
            stride = self.strides[si] if si < len(self.strides) else 2
            nm = f"s{si}"
            if stride > 1:
                down = out if self.down_growth else x.shape[-1]
                # reference cspnet.py:295-304: the downsample conv is GROUPED
                # (groups=stage groups) — matters for cspresnext50 (g=32)
                if self.avg_down:
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                    x = _ConvBnAct(down, 1, 1, groups=g, name=f"{nm}_down",
                                   **p)(x, det)
                else:
                    x = _ConvBnAct(down, 3, stride, groups=g,
                                   name=f"{nm}_down", **p)(x, det)
            if self.stage_type == "cs3":
                # CrossStage3 (reference cspnet.py cs3 stages): one 1x1
                # expand, split, blocks on half, concat, one transition
                exp = int(round(out * self.expand_ratio))
                x = _ConvBnAct(exp, 1, name=f"{nm}_exp", **p)(x, det)
                xs, xb = x[..., :exp // 2], x[..., exp // 2:]
                for j in range(depth):
                    xb = _DarkBlock(xb.shape[-1], self.bottle_ratio,
                                    groups=g, attn=self.attn,
                                    attn_ratio=self.attn_ratio,
                                    edge=self.block_type == "edge",
                                    name=f"{nm}_b{j}", **p)(xb, det)
                x = _ConvBnAct(out, 1, name=f"{nm}_trans",
                               **p)(jnp.concatenate([xs, xb], axis=-1),
                                    det)
                # stage-boundary feature tap (models/features.py)
                self.sow("intermediates", f"stage_{si}", x)
                continue
            if self.cross:
                exp = int(round(out * self.expand_ratio))
                x = _ConvBnAct(exp, 1, act=False, name=f"{nm}_exp",
                               **p)(x, det)
                xs, xb = x[..., :exp // 2], x[..., exp // 2:]
                bo = int(round(out * self.block_ratio))
                if xb.shape[-1] != bo:
                    # channel match for the residual block path
                    xb = _ConvBnAct(bo, 1, name=f"{nm}_blk_in",
                                    **p)(xb, det)
                for j in range(depth):
                    xb = _DarkBlock(bo, bottle_ratio=self.bottle_ratio,
                                    groups=g, attn=self.attn,
                                    attn_ratio=self.attn_ratio,
                                    name=f"{nm}_b{j}", **p)(xb, det) \
                        if self.block_type != "bottleneck" else block_cls(
                            bo, self.bottle_ratio, g,
                            name=f"{nm}_b{j}", **p)(xb, det)
                xb = _ConvBnAct(exp // 2, 1, name=f"{nm}_trans_b",
                                **p)(xb, det)
                x = _ConvBnAct(out, 1, name=f"{nm}_trans",
                               **p)(jnp.concatenate([xs, xb], axis=-1),
                                    det)
            else:
                if x.shape[-1] != out:
                    x = _ConvBnAct(out, 1, name=f"{nm}_in", **p)(x, det)
                for j in range(depth):
                    x = _DarkBlock(out, bottle_ratio=self.bottle_ratio,
                                   groups=g, attn=self.attn,
                                   attn_ratio=self.attn_ratio,
                                   name=f"{nm}_b{j}",
                                   **p)(x, det) \
                        if self.block_type != "bottleneck" else block_cls(
                            out, self.bottle_ratio, g,
                            name=f"{nm}_b{j}", **p)(x, det)
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head", dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        )(x).astype(jnp.float32)


def _cspnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return CspNet(**merged)

    return build


_VARIANTS = {
    "cspresnet50": dict(),
    "cspresnet50d": dict(stem_chs=(32, 32, 64), stem_kernel=3),
    "cspresnext50": dict(out_chs=(256, 512, 1024, 2048), groups=32,
                         expand_ratio=1.0, bottle_ratio=1.0,
                         block_ratio=0.5),
    "cspdarknet53": dict(stem_chs=(32,), stem_kernel=3, stem_pool=False,
                         depths=(1, 2, 8, 8, 4),
                         out_chs=(64, 128, 256, 512, 1024),
                         strides=(2, 2, 2, 2, 2), expand_ratio=1.0,
                         bottle_ratio=1.0, block_ratio=0.5,
                         down_growth=True, block_type="dark"),
    "darknet53": dict(stem_chs=(32,), stem_kernel=3, stem_pool=False,
                      depths=(1, 2, 8, 8, 4),
                      out_chs=(64, 128, 256, 512, 1024),
                      strides=(2, 2, 2, 2, 2), bottle_ratio=0.5,
                      cross=False, down_growth=True, block_type="dark"),
    "cspresnet50w": dict(stem_chs=(32, 32, 64), stem_kernel=3,
                         depths=(3, 3, 5, 2),
                         out_chs=(256, 512, 1024, 2048),
                         expand_ratio=1.0, bottle_ratio=0.25,
                         block_ratio=0.5),
    "darknet17": dict(stem_chs=(32,), stem_kernel=3, stem_pool=False,
                      depths=(1,) * 5, out_chs=(64, 128, 256, 512, 1024),
                      strides=(2,) * 5, bottle_ratio=0.5, block_ratio=1.0,
                      cross=False, down_growth=True, block_type="dark"),
    "darknet21": dict(stem_chs=(32,), stem_kernel=3, stem_pool=False,
                      depths=(1, 1, 1, 2, 2),
                      out_chs=(64, 128, 256, 512, 1024),
                      strides=(2,) * 5, bottle_ratio=0.5, block_ratio=1.0,
                      cross=False, down_growth=True, block_type="dark"),
    "sedarknet21": dict(stem_chs=(32,), stem_kernel=3, stem_pool=False,
                        depths=(1, 1, 1, 2, 2),
                        out_chs=(64, 128, 256, 512, 1024),
                        strides=(2,) * 5, bottle_ratio=0.5,
                        block_ratio=1.0, cross=False, down_growth=True,
                        block_type="dark", attn="se"),
    "darknetaa53": dict(stem_chs=(32,), stem_kernel=3, stem_pool=False,
                        depths=(1, 2, 8, 8, 4),
                        out_chs=(64, 128, 256, 512, 1024),
                        strides=(2,) * 5, bottle_ratio=0.5,
                        block_ratio=1.0, cross=False, down_growth=True,
                        block_type="dark", avg_down=True),
}


def _md(c, m):
    v = max(8, int(c * m + 4) // 8 * 8)
    if v < 0.9 * c * m:
        v += 8
    return v


def _cs3(wm=1.0, dm=1.0, focus=False, attn="", attn_ratio=0.25,
         bottle_ratio=1.0, block_type="dark"):
    """reference cspnet.py:98-131 _cs3_cfg"""
    stem = ((_md(64, wm),) if focus
            else tuple(_md(c, wm) for c in (32, 64)))
    return dict(stem_chs=stem, stem_kernel=3, stem_pool=False,
                depths=tuple(int(d * dm) for d in (3, 6, 9, 3)),
                out_chs=tuple(_md(c, wm) for c in (128, 256, 512, 1024)),
                strides=(2, 2, 2, 2), expand_ratio=1.0,
                bottle_ratio=bottle_ratio, block_ratio=0.5,
                stage_type="cs3", block_type=block_type, act="silu",
                attn=attn, attn_ratio=attn_ratio, focus=focus)


for _n, _c in {
        "cs3darknet_s": _cs3(0.5, 0.5),
        "cs3darknet_m": _cs3(0.75, 0.67),
        "cs3darknet_l": _cs3(),
        "cs3darknet_x": _cs3(1.25, 1.33),
        "cs3darknet_focus_s": _cs3(0.5, 0.5, focus=True),
        "cs3darknet_focus_m": _cs3(0.75, 0.67, focus=True),
        "cs3darknet_focus_l": _cs3(focus=True),
        "cs3darknet_focus_x": _cs3(1.25, 1.33, focus=True),
        "cs3sedarknet_l": _cs3(attn="se", attn_ratio=0.25),
        "cs3sedarknet_x": _cs3(1.25, 1.33, attn="se"),
        "cs3sedarknet_xdw": dict(stem_chs=(32, 64), stem_kernel=3,
                                 stem_pool=False, depths=(3, 6, 12, 4),
                                 out_chs=(256, 512, 1024, 2048),
                                 strides=(2, 2, 2, 2), expand_ratio=1.0,
                                 bottle_ratio=0.5, block_ratio=0.5,
                                 groups=(1, 1, 256, 512),
                                 stage_type="cs3", block_type="dark",
                                 act="silu", attn="se"),
        "cs3edgenet_x": _cs3(1.25, 1.33, bottle_ratio=1.5,
                             block_type="edge"),
        "cs3se_edgenet_x": _cs3(1.25, 1.33, bottle_ratio=1.5,
                                block_type="edge", attn="se",
                                attn_ratio=0.25),
}.items():
    _VARIANTS[_n] = _c

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _cspnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"CSPNet/DarkNet variant {_name!r} (reference cspnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
