"""DenseNet in Flax, NHWC.

Parity with the reference's dormant densenet.py (~560 LoC; SURVEY §2.2):
dense blocks of BN-ReLU-1x1(4k)-BN-ReLU-3x3(k) layers whose outputs
concatenate onto a growing feature map, 1x1-conv + avgpool transitions
halving channels and resolution, classic 7x7 (or 'deep' 3x3x3) stem
(reference densenet.py:495-550 variant args).

TPU note: the running concatenation is memory-layout friendly in NHWC —
XLA fuses the BN-ReLU prologue into each conv.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class DenseNet(nn.Module):
    """Reference densenet.py:200-390 (DenseNet)."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    stem_type: str = ""                     # '' | 'deep'
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)

        x = x.astype(self.dtype)
        if self.stem_type == "deep":
            mid = self.num_init_features // 2
            x = nn.relu(bn("stem_bn0")(conv(mid, 3, 2, "stem_conv0")(x)))
            x = nn.relu(bn("stem_bn1")(conv(mid, 3, 1, "stem_conv1")(x)))
            x = nn.relu(bn("stem_bn2")(
                conv(self.num_init_features, 3, 1, "stem_conv2")(x)))
        else:
            x = nn.relu(bn("stem_bn")(
                conv(self.num_init_features, 7, 2, "stem_conv")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        k = self.growth_rate
        for bi, layers in enumerate(self.block_config):
            for li in range(layers):
                y = nn.relu(bn(f"db{bi}_l{li}_bn1")(x))
                y = conv(4 * k, 1, 1, f"db{bi}_l{li}_conv1")(y)
                y = nn.relu(bn(f"db{bi}_l{li}_bn2")(y))
                y = conv(k, 3, 1, f"db{bi}_l{li}_conv2")(y)
                x = jnp.concatenate([x, y], axis=-1)
            # stage-boundary feature tap (models/features.py): dense-block
            # output pre-transition, matching timm densenet feature_info
            self.sow("intermediates", f"stage_{bi}", x)
            if bi != len(self.block_config) - 1:
                x = nn.relu(bn(f"tr{bi}_bn")(x))
                x = conv(x.shape[-1] // 2, 1, 1, f"tr{bi}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        x = nn.relu(bn("final_bn")(x))
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _densenet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return DenseNet(**merged)

    return build


_VARIANTS = {
    "densenet121": dict(growth_rate=32, block_config=(6, 12, 24, 16)),
    "densenetblur121d": dict(growth_rate=32, block_config=(6, 12, 24, 16),
                             stem_type="deep"),
    "densenet169": dict(growth_rate=32, block_config=(6, 12, 32, 32)),
    "densenet201": dict(growth_rate=32, block_config=(6, 12, 48, 32)),
    "densenet161": dict(growth_rate=48, block_config=(6, 12, 36, 24),
                        num_init_features=96),
    "densenet264d": dict(growth_rate=48, block_config=(6, 12, 64, 48),
                         num_init_features=96, stem_type="deep"),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _densenet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"DenseNet variant {_name!r} (reference densenet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
