"""VoVNet v2 in Flax, NHWC.

Parity with the reference's dormant vovnet.py (~540 LoC; SURVEY §2.2):
One-Shot Aggregation blocks — a chain of 3x3 convs whose every output
(plus the block input) concatenates once into a 1x1 aggregation conv,
with effective-SE (channel gate from a single 1x1, hard-sigmoid) and
identity residual in the v2 ('b'/ese) variants (reference
vovnet.py:44-160). Three-conv stem; stages open with a stride-2
max-pool.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ConvBnAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    norm: str = "bn"                   # 'bn' | 'evos' (EvoNorm-S0)
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
        if self.norm == "evos":
            from vision_transformers_torch_xla_tpu.models.effnet_builder \
                import _Norm
            return _Norm(kind="evos", group_size=8, eps=1e-5,
                         deterministic=deterministic, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x)


class VovNet(nn.Module):
    """Reference vovnet.py:162-330 (VovNet)."""

    num_classes: int = 1000
    stem_chs: Sequence[int] = (64, 64, 128)
    stage_conv_chs: Sequence[int] = (128, 160, 192, 224)
    stage_out_chs: Sequence[int] = (256, 512, 768, 1024)
    layer_per_block: int = 5
    block_per_stage: Sequence[int] = (1, 1, 2, 2)
    residual: bool = True
    depthwise: bool = False
    attn: str = "ese"
    norm: str = "bn"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        from functools import partial as _partial
        _ConvBnActN = _partial(_ConvBnAct, norm=self.norm)
        x = x.astype(self.dtype)
        # stem: 3 convs, stride 2 on first and last (reference :186-200)
        x = _ConvBnActN(self.stem_chs[0], 3, 2, name="stem_0", **p)(x, det)
        x = _ConvBnActN(self.stem_chs[1], 3, 1, name="stem_1", **p)(x, det)
        x = _ConvBnActN(self.stem_chs[2], 3, 2, name="stem_2", **p)(x, det)

        for si in range(4):
            if si > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
            mid = self.stage_conv_chs[si]
            out = self.stage_out_chs[si]
            for bi in range(self.block_per_stage[si]):
                nm = f"s{si}_b{bi}"
                inp = x
                feats = [x]
                y = x
                if self.depthwise and y.shape[-1] != mid:
                    y = _ConvBnActN(mid, 1, name=f"{nm}_reduce",
                                   **p)(y, det)
                for li in range(self.layer_per_block):
                    if self.depthwise:
                        y = _ConvBnActN(mid, 3, groups=mid,
                                       name=f"{nm}_mid{li}_dw",
                                       **p)(y, det)
                        y = _ConvBnActN(mid, 1, name=f"{nm}_mid{li}_pw",
                                       **p)(y, det)
                    else:
                        y = _ConvBnActN(mid, 3, name=f"{nm}_mid{li}",
                                       **p)(y, det)
                    feats.append(y)
                y = jnp.concatenate(feats, axis=-1)
                y = _ConvBnActN(out, 1, name=f"{nm}_concat", **p)(y, det)
                if self.attn == "ese":
                    s = jnp.mean(y, axis=(1, 2), keepdims=True)
                    s = nn.Conv(out, (1, 1), name=f"{nm}_ese", **p)(s)
                    y = y * jnp.clip(
                        s.astype(jnp.float32) / 6 + 0.5, 0, 1
                    ).astype(y.dtype)
                elif self.attn == "eca":
                    t = int(abs((math.log2(out) + 1) / 2))
                    k = max(t if t % 2 else t + 1, 3)
                    s = jnp.mean(y, axis=(1, 2)).reshape(
                        y.shape[0], out, 1)
                    s = nn.Conv(1, (k,), padding=((k // 2, k // 2),),
                                use_bias=False,
                                name=f"{nm}_eca", **p)(s)
                    s = s.reshape(y.shape[0], 1, 1, out)
                    y = y * jax.nn.sigmoid(
                        s.astype(jnp.float32)).astype(y.dtype)
                if self.residual and bi > 0:
                    y = y + inp
                x = y
            # stage-boundary feature tap (models/features.py)
            self.sow("intermediates", f"stage_{si}", x)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _vovnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return VovNet(**merged)

    return build


_VARIANTS = {
    "vovnet39a": dict(layer_per_block=5, block_per_stage=(1, 1, 2, 2),
                      residual=False, attn=""),
    "vovnet57a": dict(layer_per_block=5, block_per_stage=(1, 1, 4, 3),
                      residual=False, attn=""),
    "ese_vovnet19b_slim_dw": dict(stem_chs=(64, 64, 64),
                                  stage_conv_chs=(64, 80, 96, 112),
                                  stage_out_chs=(112, 256, 384, 512),
                                  layer_per_block=3,
                                  block_per_stage=(1, 1, 1, 1),
                                  depthwise=True),
    "ese_vovnet19b_dw": dict(stem_chs=(64, 64, 64), layer_per_block=3,
                             block_per_stage=(1, 1, 1, 1),
                             depthwise=True),
    "ese_vovnet19b_slim": dict(stage_conv_chs=(64, 80, 96, 112),
                               stage_out_chs=(112, 256, 384, 512),
                               layer_per_block=3,
                               block_per_stage=(1, 1, 1, 1)),
    "ese_vovnet39b": dict(layer_per_block=5, block_per_stage=(1, 1, 2, 2)),
    "ese_vovnet57b": dict(layer_per_block=5, block_per_stage=(1, 1, 4, 3)),
    "ese_vovnet99b": dict(layer_per_block=5, block_per_stage=(1, 3, 9, 3)),
    "eca_vovnet39b": dict(layer_per_block=5, block_per_stage=(1, 1, 2, 2),
                          attn="eca"),
    "ese_vovnet39b_evos": dict(layer_per_block=5,
                               block_per_stage=(1, 1, 2, 2), norm="evos"),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _vovnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"VoVNet variant {_name!r} (reference vovnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
