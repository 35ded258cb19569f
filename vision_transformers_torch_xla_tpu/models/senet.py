"""Legacy SENet in Flax, NHWC.

Parity with the reference's dormant senet.py (465 LoC; SURVEY §2.2):
the original Caffe-style SE networks — SE modules (reduction 16) on
every residual; seresnet bottlenecks put the stride on the FIRST 1x1
(v1, unlike torchvision's v1.5); seresnext puts it on the grouped 3x3
with width = planes*2 (base_width 4 semantics); senet154 uses a deep
3-conv 64/64/128 stem, double-width grouped bottlenecks and 3x3
downsample convs (reference senet.py:84-180, 405-465).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class SENet(nn.Module):
    """Reference senet.py:183-400 (SENet)."""

    num_classes: int = 1000
    block: str = "seresnet"        # 'seresnet' | 'sebasic' | 'seresnext' | 'senet154'
    layers: Sequence[int] = (3, 4, 6, 3)
    groups: int = 1
    reduction: int = 16
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=det, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)

        def se(y, nm):
            c = y.shape[-1]
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.relu(conv(c // self.reduction, (1, 1), use_bias=True,
                             name=f"{nm}_fc1")(s))
            s = conv(c, (1, 1), use_bias=True, name=f"{nm}_fc2")(s)
            return y * jax.nn.sigmoid(
                s.astype(jnp.float32)).astype(y.dtype)

        x = x.astype(self.dtype)
        s154 = self.block == "senet154"
        if s154:
            for i, (c, st) in enumerate(((64, 2), (64, 1), (128, 1))):
                x = nn.relu(bn(name=f"stem_bn{i}")(conv(
                    c, (3, 3), strides=st, padding=((1, 1), (1, 1)),
                    name=f"stem_conv{i}")(x)))
        else:
            x = nn.relu(bn(name="stem_bn")(conv(
                64, (7, 7), strides=2, padding=((3, 3), (3, 3)),
                name="stem_conv")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        basic = self.block == "sebasic"
        expansion = 1 if basic else 4
        for si, depth in enumerate(self.layers):
            planes = 64 * (2 ** si)
            out = planes * expansion
            for bi in range(depth):
                stride = 2 if si > 0 and bi == 0 else 1
                nm = f"s{si}_b{bi}"
                shortcut = x
                if x.shape[-1] != out or stride > 1:
                    dk = 3 if (s154 and si > 0) else 1
                    shortcut = bn(name=f"{nm}_down_bn")(conv(
                        out, (dk, dk), strides=stride,
                        padding=((dk // 2, dk // 2),) * 2,
                        name=f"{nm}_down")(x))
                if basic:
                    y = nn.relu(bn(name=f"{nm}_bn1")(conv(
                        planes, (3, 3), strides=stride,
                        padding=((1, 1), (1, 1)), name=f"{nm}_c1")(x)))
                    y = bn(name=f"{nm}_bn2")(conv(
                        planes, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"{nm}_c2")(y))
                elif s154:
                    y = nn.relu(bn(name=f"{nm}_bn1")(conv(
                        planes * 2, (1, 1), name=f"{nm}_c1")(x)))
                    y = nn.relu(bn(name=f"{nm}_bn2")(conv(
                        planes * 4, (3, 3), strides=stride,
                        padding=((1, 1), (1, 1)),
                        feature_group_count=self.groups,
                        name=f"{nm}_c2")(y)))
                    y = bn(name=f"{nm}_bn3")(conv(
                        planes * 4, (1, 1), name=f"{nm}_c3")(y))
                elif self.block == "seresnext":
                    width = planes * 2  # base_width 4 * groups 32 scaling
                    y = nn.relu(bn(name=f"{nm}_bn1")(conv(
                        width, (1, 1), name=f"{nm}_c1")(x)))
                    y = nn.relu(bn(name=f"{nm}_bn2")(conv(
                        width, (3, 3), strides=stride,
                        padding=((1, 1), (1, 1)),
                        feature_group_count=self.groups,
                        name=f"{nm}_c2")(y)))
                    y = bn(name=f"{nm}_bn3")(conv(
                        out, (1, 1), name=f"{nm}_c3")(y))
                else:
                    # Caffe v1: stride on the FIRST 1x1
                    y = nn.relu(bn(name=f"{nm}_bn1")(conv(
                        planes, (1, 1), strides=stride,
                        name=f"{nm}_c1")(x)))
                    y = nn.relu(bn(name=f"{nm}_bn2")(conv(
                        planes, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"{nm}_c2")(y)))
                    y = bn(name=f"{nm}_bn3")(conv(
                        out, (1, 1), name=f"{nm}_c3")(y))
                y = se(y, f"{nm}_se")
                x = nn.relu(y + shortcut)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _senet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size", "drop_path_rate"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return SENet(**merged)

    return build


_VARIANTS = {
    "legacy_seresnet18": dict(block="sebasic", layers=(2, 2, 2, 2)),
    "legacy_seresnet34": dict(block="sebasic", layers=(3, 4, 6, 3)),
    "legacy_seresnet50": dict(layers=(3, 4, 6, 3)),
    "legacy_seresnet101": dict(layers=(3, 4, 23, 3)),
    "legacy_seresnet152": dict(layers=(3, 8, 36, 3)),
    "legacy_senet154": dict(block="senet154", layers=(3, 8, 36, 3),
                            groups=64),
    "legacy_seresnext26_32x4d": dict(block="seresnext",
                                     layers=(2, 2, 2, 2), groups=32),
    "legacy_seresnext50_32x4d": dict(block="seresnext",
                                     layers=(3, 4, 6, 3), groups=32),
    "legacy_seresnext101_32x4d": dict(block="seresnext",
                                      layers=(3, 4, 23, 3), groups=32),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _senet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Legacy SENet variant {_name!r} (reference senet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
