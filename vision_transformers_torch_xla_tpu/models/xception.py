"""Xception (and aligned variants) in Flax, NHWC.

Parity with the reference's dormant xception.py (SURVEY §2.2): entry
flow (2 convs + 3 strided separable residual blocks), middle flow (8
identity separable residual blocks at 728 channels), exit flow
(strided separable residual + 1536/2048 separable convs). Depthwise
separable conv = depthwise 3x3 + pointwise 1x1, BN after each.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _SepConv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="pw")(x)
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-3, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class Xception(nn.Module):
    """Reference xception.py (Xception-65 layout)."""

    num_classes: int = 1000
    middle_blocks: int = 8
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=det, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        x = x.astype(self.dtype)
        x = nn.relu(bn("bn1")(nn.Conv(
            32, (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            64, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv2")(x)))

        def entry_block(x, ch, name, first_relu=True):
            skip = nn.Conv(ch, (1, 1), strides=(2, 2), use_bias=False,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"{name}_skip")(x)
            skip = bn(f"{name}_skip_bn")(skip)
            y = nn.relu(x) if first_relu else x
            y = _SepConv(ch, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"{name}_sep1")(y, det)
            y = nn.relu(y)
            y = _SepConv(ch, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"{name}_sep2")(y, det)
            y = nn.max_pool(y, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            return y + skip

        x = entry_block(x, 128, "block1", first_relu=False)
        x = entry_block(x, 256, "block2")
        x = entry_block(x, 728, "block3")

        for i in range(self.middle_blocks):
            y = x
            for j in range(3):
                y = nn.relu(y)
                y = _SepConv(728, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"mid{i}_sep{j}")(y, det)
            x = x + y

        skip = nn.Conv(1024, (1, 1), strides=(2, 2), use_bias=False,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="exit_skip")(x)
        skip = bn("exit_skip_bn")(skip)
        y = nn.relu(x)
        y = _SepConv(728, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="exit_sep1")(y, det)
        y = nn.relu(y)
        y = _SepConv(1024, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="exit_sep2")(y, det)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = y + skip

        x = nn.relu(_SepConv(1536, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="conv3")(x, det))
        x = nn.relu(_SepConv(2048, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="conv4")(x, det))
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _xception(**kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks", "img_size"):
        kw.pop(k, None)
    kw = {k: v for k, v in kw.items() if v is not None}
    return Xception(**kw)


# the reference registers this trunk as `legacy_xception` with an
# `xception` deprecation alias (reference xception.py:253-255)
_xception.__name__ = "legacy_xception"
_xception.__qualname__ = "legacy_xception"
legacy_xception = register_model(_xception)

from vision_transformers_torch_xla_tpu.models.registry import (  # noqa: E402
    register_deprecation,
)

register_deprecation("xception", "legacy_xception")
