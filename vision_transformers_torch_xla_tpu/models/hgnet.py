"""PP-HGNet v1/v2 in Flax, NHWC.

Parity with the reference's dormant hgnet.py (795 LoC; SURVEY §2.2):
high-perf-GPU blocks — a chain of convs (v2 stages use light blocks:
1x1 then depthwise kxk) whose outputs plus the input concatenate into
an aggregation (v1: 1x1 conv + effective-SE gate; v2: squeeze/excite
conv pair), residual within a stage (reference hgnet.py:206-293).
v1 stem: 3 convs + maxpool; v2 stem: parallel 2x2 branch + pool concat.
2048-wide hidden classifier head.
"""
from __future__ import annotations

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
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        k = self.kernel
        pad = "SAME" if k % 2 == 0 else ((k // 2, k // 2),) * 2
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class HighPerfGpuNet(nn.Module):
    """Reference hgnet.py:414-580 (HighPerfGpuNet)."""

    num_classes: int = 1000
    stem_type: str = "v1"
    stem_chs: Sequence[int] = (48, 48, 96)
    # per-stage: (in, mid, out, blocks, downsample, light, kernel, layers)
    stages_cfg: Sequence = ()
    head_hidden: int = 2048
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.stem_type == "v1":
            chs = self.stem_chs
            for i, c in enumerate(chs):
                x = _ConvBnAct(c, 3, 2 if i == 0 else 1,
                               name=f"stem_{i}", **p)(x, det)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        else:
            mid, out0 = self.stem_chs
            x = _ConvBnAct(mid, 3, 2, name="stem1", **p)(x, det)
            x2 = _ConvBnAct(mid // 2, 2, name="stem2a", **p)(x, det)
            x2 = _ConvBnAct(mid, 2, name="stem2b", **p)(x2, det)
            x1 = nn.max_pool(x, (2, 2), strides=(1, 1), padding="SAME")
            x = jnp.concatenate([x1, x2], axis=-1)
            x = _ConvBnAct(mid, 3, 2, name="stem3", **p)(x, det)
            x = _ConvBnAct(out0, 1, name="stem4", **p)(x, det)

        agg_se = self.stem_type == "v2"
        for si, (in_c, mid_c, out_c, blocks, down, light, ks,
                 layers) in enumerate(self.stages_cfg):
            if down:
                c = x.shape[-1]
                x = _ConvBnAct(c, 3, 2, groups=c, act=False,
                               name=f"s{si}_down", **p)(x, det)
            for bi in range(blocks):
                nm = f"s{si}_b{bi}"
                identity = x
                outs = [x]
                y = x
                for li in range(layers):
                    if light:
                        y = _ConvBnAct(mid_c, 1, act=False,
                                       name=f"{nm}_l{li}_pw",
                                       **p)(y, det)
                        y = _ConvBnAct(mid_c, ks, groups=mid_c,
                                       name=f"{nm}_l{li}_dw",
                                       **p)(y, det)
                    else:
                        y = _ConvBnAct(mid_c, ks, name=f"{nm}_l{li}",
                                       **p)(y, det)
                    outs.append(y)
                y = jnp.concatenate(outs, axis=-1)
                if agg_se:
                    y = _ConvBnAct(out_c // 2, 1, name=f"{nm}_agg_sq",
                                   **p)(y, det)
                    y = _ConvBnAct(out_c, 1, name=f"{nm}_agg_ex",
                                   **p)(y, det)
                else:
                    y = _ConvBnAct(out_c, 1, name=f"{nm}_agg",
                                   **p)(y, det)
                    s = jnp.mean(y, axis=(1, 2), keepdims=True)
                    s = nn.Conv(out_c, (1, 1), name=f"{nm}_ese", **p)(s)
                    y = y * jax.nn.sigmoid(
                        s.astype(jnp.float32)).astype(y.dtype)
                x = y + identity if bi > 0 else y

        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(self.head_hidden, name="last_conv",
                             **p)(x))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _hgnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return HighPerfGpuNet(**merged)

    return build


_VARIANTS = {
    "hgnet_tiny": dict(stem_type="v1", stem_chs=(48, 48, 96), stages_cfg=(
        (96, 96, 224, 1, False, False, 3, 5),
        (224, 128, 448, 1, True, False, 3, 5),
        (448, 160, 512, 2, True, False, 3, 5),
        (512, 192, 768, 1, True, False, 3, 5))),
    "hgnet_small": dict(stem_type="v1", stem_chs=(64, 64, 128),
                        stages_cfg=(
        (128, 128, 256, 1, False, False, 3, 6),
        (256, 160, 512, 1, True, False, 3, 6),
        (512, 192, 768, 2, True, False, 3, 6),
        (768, 224, 1024, 1, True, False, 3, 6))),
    "hgnet_base": dict(stem_type="v1", stem_chs=(96, 96, 160),
                       stages_cfg=(
        (160, 192, 320, 1, False, False, 3, 7),
        (320, 224, 640, 2, True, False, 3, 7),
        (640, 256, 960, 3, True, False, 3, 7),
        (960, 288, 1280, 2, True, False, 3, 7))),
    "hgnetv2_b0": dict(stem_type="v2", stem_chs=(16, 16), stages_cfg=(
        (16, 16, 64, 1, False, False, 3, 3),
        (64, 32, 256, 1, True, False, 3, 3),
        (256, 64, 512, 2, True, True, 5, 3),
        (512, 128, 1024, 1, True, True, 5, 3))),
    "hgnetv2_b1": dict(stem_type="v2", stem_chs=(24, 32), stages_cfg=(
        (32, 32, 64, 1, False, False, 3, 3),
        (64, 48, 256, 1, True, False, 3, 3),
        (256, 96, 512, 2, True, True, 5, 3),
        (512, 192, 1024, 1, True, True, 5, 3))),
    "hgnetv2_b2": dict(stem_type="v2", stem_chs=(24, 32), stages_cfg=(
        (32, 32, 96, 1, False, False, 3, 4),
        (96, 64, 384, 1, True, False, 3, 4),
        (384, 128, 768, 3, True, True, 5, 4),
        (768, 256, 1536, 1, True, True, 5, 4))),
    "hgnetv2_b3": dict(stem_type="v2", stem_chs=(24, 32), stages_cfg=(
        (32, 32, 128, 1, False, False, 3, 5),
        (128, 64, 512, 1, True, False, 3, 5),
        (512, 128, 1024, 3, True, True, 5, 5),
        (1024, 256, 2048, 1, True, True, 5, 5))),
    "hgnetv2_b4": dict(stem_type="v2", stem_chs=(32, 48), stages_cfg=(
        (48, 48, 128, 1, False, False, 3, 6),
        (128, 96, 512, 1, True, False, 3, 6),
        (512, 192, 1024, 3, True, True, 5, 6),
        (1024, 384, 2048, 1, True, True, 5, 6))),
    "hgnetv2_b5": dict(stem_type="v2", stem_chs=(32, 64), stages_cfg=(
        (64, 64, 128, 1, False, False, 3, 6),
        (128, 128, 512, 2, True, False, 3, 6),
        (512, 256, 1024, 5, True, True, 5, 6),
        (1024, 512, 2048, 2, True, True, 5, 6))),
    "hgnetv2_b6": dict(stem_type="v2", stem_chs=(48, 96), stages_cfg=(
        (96, 96, 192, 2, False, False, 3, 6),
        (192, 192, 512, 3, True, False, 3, 6),
        (512, 384, 1024, 6, True, True, 5, 6),
        (1024, 768, 2048, 3, True, True, 5, 6))),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _hgnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"PP-HGNet variant {_name!r} (reference hgnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
