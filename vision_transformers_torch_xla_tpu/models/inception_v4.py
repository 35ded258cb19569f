"""Inception v4 in Flax, NHWC.

Parity with the reference's dormant inception_v4.py (387 LoC; SURVEY
§2.2): the full stem (Mixed3a/4a/5a conv/pool concats), 4x InceptionA,
ReductionA, 7x InceptionB with factorized 1x7/7x1 towers, ReductionB,
3x InceptionC with forked 1x3/3x1 outputs.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _C(nn.Module):
    features: int
    kernel: tuple = (3, 3)
    stride: int = 1
    padding: tuple = (0, 0)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kh, kw = self.kernel
        ph, pw = self.padding
        x = nn.Conv(self.features, (kh, kw),
                    strides=(self.stride, self.stride),
                    padding=((ph, ph), (pw, pw)), use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x)


class InceptionV4(nn.Module):
    """Reference inception_v4.py:221-380 (InceptionV4)."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        C = lambda f, k=(3, 3), s=1, pad=(0, 0), name=None: _C(  # noqa: E731
            f, k, s, pad, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        mp = lambda y: nn.max_pool(y, (3, 3), strides=(2, 2))  # noqa: E731
        ap = lambda y: nn.avg_pool(y, (3, 3), strides=(1, 1),  # noqa: E731
                                   padding=((1, 1), (1, 1)))
        cat = lambda *ys: jnp.concatenate(ys, axis=-1)  # noqa: E731

        x = x.astype(self.dtype)
        x = C(32, s=2, name="s0")(x, det)
        x = C(32, name="s1")(x, det)
        x = C(64, pad=(1, 1), name="s2")(x, det)
        x = cat(mp(x), C(96, s=2, name="m3a")(x, det))        # Mixed3a
        b0 = C(96, name="m4a_b0b")(C(64, (1, 1), name="m4a_b0a")(x, det),
                                   det)
        b1 = C(64, (1, 1), name="m4a_b1a")(x, det)
        b1 = C(64, (1, 7), pad=(0, 3), name="m4a_b1b")(b1, det)
        b1 = C(64, (7, 1), pad=(3, 0), name="m4a_b1c")(b1, det)
        b1 = C(96, name="m4a_b1d")(b1, det)
        x = cat(b0, b1)                                       # Mixed4a
        x = cat(C(192, s=2, name="m5a")(x, det), mp(x))       # Mixed5a

        def inception_a(x, nm):
            b0 = C(96, (1, 1), name=f"{nm}_b0")(x, det)
            b1 = C(96, pad=(1, 1), name=f"{nm}_b1b")(
                C(64, (1, 1), name=f"{nm}_b1a")(x, det), det)
            b2 = C(96, pad=(1, 1), name=f"{nm}_b2c")(
                C(96, pad=(1, 1), name=f"{nm}_b2b")(
                    C(64, (1, 1), name=f"{nm}_b2a")(x, det), det), det)
            b3 = C(96, (1, 1), name=f"{nm}_b3")(ap(x), det)
            return cat(b0, b1, b2, b3)

        for i in range(4):
            x = inception_a(x, f"ia{i}")
        b0 = C(384, s=2, name="ra_b0")(x, det)
        b1 = C(256, s=2, name="ra_b1c")(
            C(224, pad=(1, 1), name="ra_b1b")(
                C(192, (1, 1), name="ra_b1a")(x, det), det), det)
        x = cat(b0, b1, mp(x))                                # ReductionA

        def inception_b(x, nm):
            b0 = C(384, (1, 1), name=f"{nm}_b0")(x, det)
            b1 = C(192, (1, 1), name=f"{nm}_b1a")(x, det)
            b1 = C(224, (1, 7), pad=(0, 3), name=f"{nm}_b1b")(b1, det)
            b1 = C(256, (7, 1), pad=(3, 0), name=f"{nm}_b1c")(b1, det)
            b2 = C(192, (1, 1), name=f"{nm}_b2a")(x, det)
            b2 = C(192, (7, 1), pad=(3, 0), name=f"{nm}_b2b")(b2, det)
            b2 = C(224, (1, 7), pad=(0, 3), name=f"{nm}_b2c")(b2, det)
            b2 = C(224, (7, 1), pad=(3, 0), name=f"{nm}_b2d")(b2, det)
            b2 = C(256, (1, 7), pad=(0, 3), name=f"{nm}_b2e")(b2, det)
            b3 = C(128, (1, 1), name=f"{nm}_b3")(ap(x), det)
            return cat(b0, b1, b2, b3)

        for i in range(7):
            x = inception_b(x, f"ib{i}")
        b0 = C(192, s=2, name="rb_b0b")(
            C(192, (1, 1), name="rb_b0a")(x, det), det)
        b1 = C(256, (1, 1), name="rb_b1a")(x, det)
        b1 = C(256, (1, 7), pad=(0, 3), name="rb_b1b")(b1, det)
        b1 = C(320, (7, 1), pad=(3, 0), name="rb_b1c")(b1, det)
        b1 = C(320, s=2, name="rb_b1d")(b1, det)
        x = cat(b0, b1, mp(x))                                # ReductionB

        def inception_c(x, nm):
            b0 = C(256, (1, 1), name=f"{nm}_b0")(x, det)
            b1 = C(384, (1, 1), name=f"{nm}_b1")(x, det)
            b1a = C(256, (1, 3), pad=(0, 1), name=f"{nm}_b1a")(b1, det)
            b1b = C(256, (3, 1), pad=(1, 0), name=f"{nm}_b1b")(b1, det)
            b2 = C(384, (1, 1), name=f"{nm}_b2a")(x, det)
            b2 = C(448, (3, 1), pad=(1, 0), name=f"{nm}_b2b")(b2, det)
            b2 = C(512, (1, 3), pad=(0, 1), name=f"{nm}_b2c")(b2, det)
            b2a = C(256, (1, 3), pad=(0, 1), name=f"{nm}_b2d")(b2, det)
            b2b = C(256, (3, 1), pad=(1, 0), name=f"{nm}_b2e")(b2, det)
            b3 = C(256, (1, 1), name=f"{nm}_b3")(ap(x), det)
            return cat(b0, b1a, b1b, b2a, b2b, b3)

        for i in range(3):
            x = inception_c(x, f"ic{i}")

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _inception_v4(**kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks", "img_size"):
        kw.pop(k, None)
    kw = {k: v for k, v in kw.items() if v is not None}
    return InceptionV4(**kw)


_inception_v4.__name__ = "inception_v4"
_inception_v4.__qualname__ = "inception_v4"
inception_v4 = register_model(_inception_v4)
