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
        return nn.leaky_relu(x, 0.01) if self.act else x


class _Bottleneck(nn.Module):
    out_chs: int
    bottle_ratio: float = 0.25
    groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = int(round(self.out_chs * self.bottle_ratio))
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = _ConvBnAct(mid, 1, name="conv1", **p)(x, deterministic)
        y = _ConvBnAct(mid, 3, groups=self.groups, name="conv2",
                       **p)(y, deterministic)
        y = _ConvBnAct(self.out_chs, 1, act=False, name="conv3",
                       **p)(y, deterministic)
        return nn.leaky_relu(y + x, 0.01)


class _DarkBlock(nn.Module):
    out_chs: int
    bottle_ratio: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = int(round(self.out_chs * self.bottle_ratio))
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = _ConvBnAct(mid, 1, name="conv1", **p)(x, deterministic)
        y = _ConvBnAct(self.out_chs, 3, name="conv2",
                       **p)(y, deterministic)
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
    groups: int = 1
    cross: bool = True                 # CSP split vs plain dark stage
    block_type: str = "bottleneck"     # 'bottleneck' | 'dark'
    down_growth: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        for i, c in enumerate(self.stem_chs):
            s = 2 if i == 0 else 1
            x = _ConvBnAct(c, self.stem_kernel if len(self.stem_chs) == 1
                           else 3, s, name=f"stem_{i}", **p)(x, det)
        if self.stem_pool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        block_cls = (_Bottleneck if self.block_type == "bottleneck"
                     else _DarkBlock)
        for si, depth in enumerate(self.depths):
            out = self.out_chs[si]
            stride = self.strides[si] if si < len(self.strides) else 2
            nm = f"s{si}"
            if stride > 1:
                down = out if self.down_growth else x.shape[-1]
                x = _ConvBnAct(down, 3, stride, name=f"{nm}_down",
                               **p)(x, det)
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
                    xb = block_cls(bo, bottle_ratio=self.bottle_ratio,
                                   name=f"{nm}_b{j}", **p)(xb, det) \
                        if self.block_type == "dark" else block_cls(
                            bo, self.bottle_ratio, self.groups,
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
                    x = block_cls(out, bottle_ratio=self.bottle_ratio,
                                  name=f"{nm}_b{j}", **p)(x, det)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


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
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _cspnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"CSPNet/DarkNet variant {_name!r} (reference cspnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
