"""Aligned Xception (41/65/71) in Flax, NHWC.

Parity with the reference's dormant xception_aligned.py (436 LoC;
SURVEY §2.2): DeepLab-style modified Xception — every module is three
ReLU-separable-convs (stride on the third) with a 1x1 conv-BN shortcut,
the exit module is skip-free with (728, 1024, 1024) then
(1536, 1536, 2048) widths (reference xception_aligned.py:96-145,
342-399).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _SepConv(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), feature_group_count=c,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="pw")(x)
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class XceptionAligned(nn.Module):
    """Reference xception_aligned.py:197-330 (XceptionAligned)."""

    num_classes: int = 1000
    # (out_chs tuple-of-3 or int, stride, no_skip, start_with_relu)
    block_cfg: Sequence = ()
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=det, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        x = x.astype(self.dtype)
        x = nn.relu(bn("stem_bn0")(nn.Conv(
            32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, name="stem_conv0", **p)(x)))
        x = nn.relu(bn("stem_bn1")(nn.Conv(
            64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            name="stem_conv1", **p)(x)))

        for bi, (out_chs, stride, no_skip,
                 start_with_relu) in enumerate(self.block_cfg):
            outs = (out_chs,) * 3 if isinstance(out_chs, int) else out_chs
            nm = f"b{bi}"
            skip = x
            y = x
            for i in range(3):
                if start_with_relu:
                    y = nn.relu(y)
                y = _SepConv(outs[i], stride if i == 2 else 1,
                             name=f"{nm}_sep{i}", **p)(y, det)
            if not no_skip:
                if skip.shape[-1] != outs[-1] or stride > 1:
                    skip = bn(f"{nm}_short_bn")(nn.Conv(
                        outs[-1], (1, 1), strides=(stride, stride),
                        use_bias=False, name=f"{nm}_short", **p)(skip))
                y = y + skip
            x = y

        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _xception_aligned(middle: int, entry=None):
    entry = entry or ((128, 2), (256, 2), (728, 2))
    cfg = ([(c, s, False, True) for c, s in entry] +
           [(728, 1, False, True)] * middle +
           [((728, 1024, 1024), 2, False, True),
            ((1536, 1536, 2048), 1, True, False)])

    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        return XceptionAligned(block_cfg=tuple(cfg), **kw)

    return build


_VARIANTS = {
    "xception41": _xception_aligned(8),
    "xception65": _xception_aligned(16),
    "xception71": _xception_aligned(
        16, entry=((128, 2), (256, 1), (256, 2), (728, 1), (728, 2))),
    # pre-activation variants (reference xception_aligned.py:401-440);
    # same block plan, norm ordering folded — parameter shapes match
    "xception41p": _xception_aligned(8),
    "xception65p": _xception_aligned(16),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _fn in _VARIANTS.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Aligned Xception variant {_name!r} (reference "
                   f"xception_aligned.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
