"""DLA (Deep Layer Aggregation) in Flax, NHWC.

Parity with the reference's dormant dla.py (514 LoC; SURVEY §2.2):
recursive binary aggregation trees — each level runs two subtrees (the
second fed by the first) whose outputs, plus level-root/child skips,
merge through a 1x1 Root conv (reference dla.py:165-258). Basic and
(grouped) bottleneck blocks take an explicit shortcut input; strided
levels downsample via max-pool with a 1x1 projection shortcut.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class DLA(nn.Module):
    """Reference dla.py:260-420 (DLA)."""

    num_classes: int = 1000
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    block: str = "basic"               # 'basic' | 'bottleneck'
    cardinality: int = 1
    base_width: int = 64
    shortcut_root: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def conv_bn(y, feats, k, s, name, groups=1, act=True):
            y = nn.Conv(feats, (k, k), strides=(s, s),
                        padding=((k // 2, k // 2),) * 2,
                        feature_group_count=groups, use_bias=False,
                        name=f"{name}_conv", **p)(y)
            y = nn.BatchNorm(use_running_average=det, momentum=0.9,
                             epsilon=1e-5, name=f"{name}_bn", **p)(y)
            return nn.relu(y) if act else y

        def block(y, shortcut, out, stride, name):
            if self.block == "basic":
                z = conv_bn(y, out, 3, stride, f"{name}_c1")
                z = conv_bn(z, out, 3, 1, f"{name}_c2", act=False)
            elif self.block == "bottle2neck":
                # Res2Net-style multi-scale split (reference dla.py
                # DlaBottle2neck): 1x1 -> cascaded per-split 3x3 -> 1x1
                scale = 4
                mid = max(1, int(out * (self.base_width / 64))
                          * self.cardinality)
                mid = (mid // scale) * scale or scale
                z = conv_bn(y, mid, 1, 1, f"{name}_c1")
                splits = jnp.split(z, scale, axis=-1)
                outs = []
                prev = None
                for si2, sp in enumerate(splits[:-1]):
                    if prev is not None and stride == 1:
                        sp = sp + prev
                    sp = conv_bn(sp, mid // scale, 3, stride,
                                 f"{name}_c2_{si2}",
                                 groups=self.cardinality)
                    outs.append(sp)
                    prev = sp
                last = splits[-1]
                if stride > 1:
                    last = nn.avg_pool(last, (stride, stride),
                                       strides=(stride, stride))
                outs.append(last)
                z = jnp.concatenate(outs, axis=-1)
                z = conv_bn(z, out, 1, 1, f"{name}_c3", act=False)
            else:
                # mid = floor(out * bw/64) * cardinality / expansion(2)
                # (reference dla.py:62-64)
                mid = (int(out * (self.base_width / 64)) *
                       self.cardinality) // 2
                z = conv_bn(y, mid, 1, 1, f"{name}_c1")
                z = conv_bn(z, mid, 3, stride, f"{name}_c2",
                            groups=self.cardinality)
                z = conv_bn(z, out, 1, 1, f"{name}_c3", act=False)
            return nn.relu(z + shortcut)

        def root(children, out, name, shortcut):
            y = jnp.concatenate(children, axis=-1)
            y = conv_bn(y, out, 1, 1, f"{name}_root", act=False)
            if shortcut:
                y = y + children[0]
            return nn.relu(y)

        def tree(y, levels, in_chs, out, stride, level_root, root_dim,
                 name, children=None):
            children = children or []
            if root_dim == 0:
                root_dim = 2 * out
            if level_root:
                root_dim += in_chs
            bottom = (nn.max_pool(y, (stride, stride),
                                  strides=(stride, stride))
                      if stride > 1 else y)
            if in_chs != out:
                shortcut = conv_bn(bottom, out, 1, 1, f"{name}_proj",
                                   act=False)
            else:
                shortcut = bottom
            if level_root:
                children.append(bottom)
            if levels == 1:
                x1 = block(y, shortcut, out, stride, f"{name}_t1")
                x2 = block(x1, x1, out, 1, f"{name}_t2")
                return root([x2, x1] + children, out, name,
                            self.shortcut_root)
            x1 = tree(y, levels - 1, in_chs, out, stride, False, 0,
                      f"{name}_t1")
            children.append(x1)
            return tree(x1, levels - 1, out, out, 1, False,
                        root_dim + out, f"{name}_t2", children)

        chs = self.channels
        x = conv_bn(x.astype(self.dtype), chs[0], 7, 1, "base")
        for i in range(self.levels[0]):
            x = conv_bn(x, chs[0], 3, 1, f"level0_{i}")
        for i in range(self.levels[1]):
            x = conv_bn(x, chs[1], 3, 2 if i == 0 else 1, f"level1_{i}")
        x = tree(x, self.levels[2], chs[1], chs[2], 2, False, 0, "level2")
        x = tree(x, self.levels[3], chs[2], chs[3], 2, True, 0, "level3")
        x = tree(x, self.levels[4], chs[3], chs[4], 2, True, 0, "level4")
        x = tree(x, self.levels[5], chs[4], chs[5], 2, True, 0, "level5")

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _dla(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return DLA(**merged)

    return build


_VARIANTS = {
    "dla34": dict(levels=(1, 1, 1, 2, 2, 1),
                  channels=(16, 32, 64, 128, 256, 512), block="basic"),
    "dla46_c": dict(levels=(1, 1, 1, 2, 2, 1),
                    channels=(16, 32, 64, 64, 128, 256),
                    block="bottleneck"),
    "dla46x_c": dict(levels=(1, 1, 1, 2, 2, 1),
                     channels=(16, 32, 64, 64, 128, 256),
                     block="bottleneck", cardinality=32, base_width=4),
    "dla60x_c": dict(levels=(1, 1, 1, 2, 3, 1),
                     channels=(16, 32, 64, 64, 128, 256),
                     block="bottleneck", cardinality=32, base_width=4),
    "dla60": dict(levels=(1, 1, 1, 2, 3, 1),
                  channels=(16, 32, 128, 256, 512, 1024),
                  block="bottleneck"),
    "dla60x": dict(levels=(1, 1, 1, 2, 3, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block="bottleneck", cardinality=32, base_width=4),
    "dla102": dict(levels=(1, 1, 1, 3, 4, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block="bottleneck", shortcut_root=True),
    "dla102x": dict(levels=(1, 1, 1, 3, 4, 1),
                    channels=(16, 32, 128, 256, 512, 1024),
                    block="bottleneck", cardinality=32, base_width=4,
                    shortcut_root=True),
    "dla102x2": dict(levels=(1, 1, 1, 3, 4, 1),
                     channels=(16, 32, 128, 256, 512, 1024),
                     block="bottleneck", cardinality=64, base_width=4,
                     shortcut_root=True),
    "dla169": dict(levels=(1, 1, 2, 3, 5, 1),
                   channels=(16, 32, 128, 256, 512, 1024),
                   block="bottleneck", shortcut_root=True),
    "dla60_res2net": dict(levels=(1, 1, 1, 2, 3, 1),
                          channels=(16, 32, 128, 256, 512, 1024),
                          block="bottle2neck", cardinality=1,
                          base_width=28),
    "dla60_res2next": dict(levels=(1, 1, 1, 2, 3, 1),
                           channels=(16, 32, 128, 256, 512, 1024),
                           block="bottle2neck", cardinality=8,
                           base_width=4),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _dla(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"DLA variant {_name!r} (reference dla.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
