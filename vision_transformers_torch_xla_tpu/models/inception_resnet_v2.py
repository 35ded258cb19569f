"""Inception-ResNet-v2 in Flax, NHWC.

Parity with the reference's dormant inception_resnet_v2.py (339 LoC;
SURVEY §2.2): Mixed_5b inception stem, 10x Block35 (scale-0.17
residual), Mixed_6a reduction, 20x Block17 (0.10), Mixed_7a reduction,
9x Block8 (0.20) + final no-relu Block8, 1536-wide conv2d_7b.
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


class InceptionResnetV2(nn.Module):
    """Reference inception_resnet_v2.py:194-330."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        C = lambda f, k=(3, 3), s=1, pad=(0, 0), name=None: _C(  # noqa: E731
            f, k, s, pad, name=name, **p)
        mp = lambda y: nn.max_pool(y, (3, 3), strides=(2, 2))  # noqa: E731
        ap = lambda y: nn.avg_pool(y, (3, 3), strides=(1, 1),  # noqa: E731
                                   padding=((1, 1), (1, 1)))
        cat = lambda *ys: jnp.concatenate(ys, axis=-1)  # noqa: E731

        x = x.astype(self.dtype)
        x = C(32, s=2, name="c1a")(x, det)
        x = C(32, name="c2a")(x, det)
        x = C(64, pad=(1, 1), name="c2b")(x, det)
        x = mp(x)
        x = C(80, (1, 1), name="c3b")(x, det)
        x = C(192, name="c4a")(x, det)
        x = mp(x)

        # Mixed_5b
        b0 = C(96, (1, 1), name="m5b_b0")(x, det)
        b1 = C(64, (5, 5), pad=(2, 2), name="m5b_b1b")(
            C(48, (1, 1), name="m5b_b1a")(x, det), det)
        b2 = C(96, pad=(1, 1), name="m5b_b2c")(
            C(96, pad=(1, 1), name="m5b_b2b")(
                C(64, (1, 1), name="m5b_b2a")(x, det), det), det)
        b3 = C(64, (1, 1), name="m5b_b3")(ap(x), det)
        x = cat(b0, b1, b2, b3)

        for i in range(10):  # Block35 x10
            nm = f"b35_{i}"
            b0 = C(32, (1, 1), name=f"{nm}_b0")(x, det)
            b1 = C(32, pad=(1, 1), name=f"{nm}_b1b")(
                C(32, (1, 1), name=f"{nm}_b1a")(x, det), det)
            b2 = C(64, pad=(1, 1), name=f"{nm}_b2c")(
                C(48, pad=(1, 1), name=f"{nm}_b2b")(
                    C(32, (1, 1), name=f"{nm}_b2a")(x, det), det), det)
            y = nn.Conv(320, (1, 1), name=f"{nm}_proj",
                        **p)(cat(b0, b1, b2))
            x = nn.relu(y * 0.17 + x)

        # Mixed_6a
        b0 = C(384, s=2, name="m6a_b0")(x, det)
        b1 = C(384, s=2, name="m6a_b1c")(
            C(256, pad=(1, 1), name="m6a_b1b")(
                C(256, (1, 1), name="m6a_b1a")(x, det), det), det)
        x = cat(b0, b1, mp(x))

        for i in range(20):  # Block17 x20
            nm = f"b17_{i}"
            b0 = C(192, (1, 1), name=f"{nm}_b0")(x, det)
            b1 = C(128, (1, 1), name=f"{nm}_b1a")(x, det)
            b1 = C(160, (1, 7), pad=(0, 3), name=f"{nm}_b1b")(b1, det)
            b1 = C(192, (7, 1), pad=(3, 0), name=f"{nm}_b1c")(b1, det)
            y = nn.Conv(1088, (1, 1), name=f"{nm}_proj", **p)(cat(b0, b1))
            x = nn.relu(y * 0.10 + x)

        # Mixed_7a
        b0 = C(384, s=2, name="m7a_b0b")(
            C(256, (1, 1), name="m7a_b0a")(x, det), det)
        b1 = C(288, s=2, name="m7a_b1b")(
            C(256, (1, 1), name="m7a_b1a")(x, det), det)
        b2 = C(320, s=2, name="m7a_b2c")(
            C(288, pad=(1, 1), name="m7a_b2b")(
                C(256, (1, 1), name="m7a_b2a")(x, det), det), det)
        x = cat(b0, b1, b2, mp(x))

        def block8(x, nm, scale, relu):
            b0 = C(192, (1, 1), name=f"{nm}_b0")(x, det)
            b1 = C(192, (1, 1), name=f"{nm}_b1a")(x, det)
            b1 = C(224, (1, 3), pad=(0, 1), name=f"{nm}_b1b")(b1, det)
            b1 = C(256, (3, 1), pad=(1, 0), name=f"{nm}_b1c")(b1, det)
            y = nn.Conv(2080, (1, 1), name=f"{nm}_proj", **p)(cat(b0, b1))
            y = y * scale + x
            return nn.relu(y) if relu else y

        for i in range(9):
            x = block8(x, f"b8_{i}", 0.20, True)
        x = block8(x, "b8_final", 1.0, False)
        x = C(1536, (1, 1), name="c7b")(x, det)

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _inception_resnet_v2(**kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks", "img_size"):
        kw.pop(k, None)
    kw = {k: v for k, v in kw.items() if v is not None}
    return InceptionResnetV2(**kw)


_inception_resnet_v2.__name__ = "inception_resnet_v2"
_inception_resnet_v2.__qualname__ = "inception_resnet_v2"
inception_resnet_v2 = register_model(_inception_resnet_v2)
