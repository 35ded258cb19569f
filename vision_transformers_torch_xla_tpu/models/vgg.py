"""VGG in Flax, NHWC.

Parity with the reference's dormant vgg.py (~420 LoC; SURVEY §2.2):
plain 3x3 conv stacks with maxpool downsamples per the classic cfgs,
optional BatchNorm (_bn variants), and timm's ConvMlp pre-logits head
(7x7 conv -> ReLU -> dropout -> 1x1 conv) before global pooling.

TPU note: the head's 7x7 kernel is clamped to the feature-map size so
reduced-resolution inputs still work (the reference requires >=224px).
"""
from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512,
              "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512,
              512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512,
              512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    """Reference vgg.py:60-180 (VGG)."""

    cfg: Sequence[Union[int, str]]
    batch_norm: bool = False
    num_classes: int = 1000
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        li = 0
        si = 0
        for v in self.cfg:
            if v == "M":
                # stage-boundary feature tap (models/features.py): conv
                # output just before each downsampling max-pool
                self.sow("intermediates", f"stage_{si}", x)
                si += 1
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(int(v), (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=not self.batch_norm, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"features_{li}")(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"features_{li}_bn")(x)
            x = nn.relu(x)
            li += 1
        # ConvMlp pre-logits head (reference vgg.py:31-57)
        k = min(7, x.shape[1], x.shape[2])
        x = nn.Conv(4096, (k, k), padding="VALID", dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pre_logits_fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = nn.Conv(4096, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pre_logits_fc2")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _vgg(cfg_name, bn):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        return VGG(cfg=_CFGS[cfg_name], batch_norm=bn, **kw)

    return build


import sys  # noqa: E402

_mod = sys.modules[__name__]
for _base in _CFGS:
    for _bn in (False, True):
        _name = _base + ("_bn" if _bn else "")
        _fn = _vgg(_base, _bn)
        _fn.__name__ = _name
        _fn.__qualname__ = _name
        _fn.__doc__ = (f"VGG variant {_name!r} (reference vgg.py registry "
                       f"surface).")
        setattr(_mod, _name, register_model(_fn))
