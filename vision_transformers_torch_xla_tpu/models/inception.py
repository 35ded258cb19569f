"""Inception v3 / v4 in Flax, NHWC.

Parity with the reference's dormant inception_v3.py / inception_v4.py
(SURVEY §2.2): the classic GoogLeNet-v3 mixed blocks (5x5/double-3x3
towers, factorized 7x1/1x7 towers, expanded 3x1+1x3 outputs) and v4's
stem/Inception-A/B/C reduction layout. All BN-ReLU convs.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _BasicConv(nn.Module):
    features: int
    kernel: tuple
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


class InceptionV3(nn.Module):
    """Reference inception_v3.py (Mixed_5-7 tower layout)."""

    num_classes: int = 1000
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        C = lambda f, k, s=1, p=(0, 0), name=None: _BasicConv(  # noqa: E731
            f, k, s, p, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name)

        x = x.astype(self.dtype)
        x = C(32, (3, 3), 2, name="c1")(x, det)
        x = C(32, (3, 3), name="c2")(x, det)
        x = C(64, (3, 3), p=(1, 1), name="c3")(x, det)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = C(80, (1, 1), name="c4")(x, det)
        x = C(192, (3, 3), name="c5")(x, det)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        def mixed_a(x, pool_ch, name):
            b1 = C(64, (1, 1), name=f"{name}_b1")(x, det)
            b5 = C(48, (1, 1), name=f"{name}_b5a")(x, det)
            b5 = C(64, (5, 5), p=(2, 2), name=f"{name}_b5b")(b5, det)
            b3 = C(64, (1, 1), name=f"{name}_b3a")(x, det)
            b3 = C(96, (3, 3), p=(1, 1), name=f"{name}_b3b")(b3, det)
            b3 = C(96, (3, 3), p=(1, 1), name=f"{name}_b3c")(b3, det)
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
            bp = C(pool_ch, (1, 1), name=f"{name}_bp")(bp, det)
            return jnp.concatenate([b1, b5, b3, bp], axis=-1)

        x = mixed_a(x, 32, "m5b")
        x = mixed_a(x, 64, "m5c")
        x = mixed_a(x, 64, "m5d")

        # reduction (Mixed_6a)
        b3 = C(384, (3, 3), 2, name="m6a_b3")(x, det)
        b2 = C(64, (1, 1), name="m6a_b2a")(x, det)
        b2 = C(96, (3, 3), p=(1, 1), name="m6a_b2b")(b2, det)
        b2 = C(96, (3, 3), 2, name="m6a_b2c")(b2, det)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b3, b2, bp], axis=-1)

        def mixed_b(x, c7, name):
            b1 = C(192, (1, 1), name=f"{name}_b1")(x, det)
            b7 = C(c7, (1, 1), name=f"{name}_b7a")(x, det)
            b7 = C(c7, (1, 7), p=(0, 3), name=f"{name}_b7b")(b7, det)
            b7 = C(192, (7, 1), p=(3, 0), name=f"{name}_b7c")(b7, det)
            d7 = C(c7, (1, 1), name=f"{name}_d7a")(x, det)
            d7 = C(c7, (7, 1), p=(3, 0), name=f"{name}_d7b")(d7, det)
            d7 = C(c7, (1, 7), p=(0, 3), name=f"{name}_d7c")(d7, det)
            d7 = C(c7, (7, 1), p=(3, 0), name=f"{name}_d7d")(d7, det)
            d7 = C(192, (1, 7), p=(0, 3), name=f"{name}_d7e")(d7, det)
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
            bp = C(192, (1, 1), name=f"{name}_bp")(bp, det)
            return jnp.concatenate([b1, b7, d7, bp], axis=-1)

        x = mixed_b(x, 128, "m6b")
        x = mixed_b(x, 160, "m6c")
        x = mixed_b(x, 160, "m6d")
        x = mixed_b(x, 192, "m6e")

        # reduction (Mixed_7a)
        b3 = C(192, (1, 1), name="m7a_b3a")(x, det)
        b3 = C(320, (3, 3), 2, name="m7a_b3b")(b3, det)
        b7 = C(192, (1, 1), name="m7a_b7a")(x, det)
        b7 = C(192, (1, 7), p=(0, 3), name="m7a_b7b")(b7, det)
        b7 = C(192, (7, 1), p=(3, 0), name="m7a_b7c")(b7, det)
        b7 = C(192, (3, 3), 2, name="m7a_b7d")(b7, det)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([b3, b7, bp], axis=-1)

        def mixed_c(x, name):
            b1 = C(320, (1, 1), name=f"{name}_b1")(x, det)
            b3 = C(384, (1, 1), name=f"{name}_b3a")(x, det)
            b3a = C(384, (1, 3), p=(0, 1), name=f"{name}_b3b")(b3, det)
            b3b = C(384, (3, 1), p=(1, 0), name=f"{name}_b3c")(b3, det)
            d3 = C(448, (1, 1), name=f"{name}_d3a")(x, det)
            d3 = C(384, (3, 3), p=(1, 1), name=f"{name}_d3b")(d3, det)
            d3a = C(384, (1, 3), p=(0, 1), name=f"{name}_d3c")(d3, det)
            d3b = C(384, (3, 1), p=(1, 0), name=f"{name}_d3d")(d3, det)
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
            bp = C(192, (1, 1), name=f"{name}_bp")(bp, det)
            return jnp.concatenate([b1, b3a, b3b, d3a, d3b, bp], axis=-1)

        x = mixed_c(x, "m7b")
        x = mixed_c(x, "m7c")

        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _inception_v3(**kw):
    for k in ("pretrained_tag", "global_pool", "init_values", "remat",
              "scan_blocks", "img_size"):
        kw.pop(k, None)
    kw = {k: v for k, v in kw.items() if v is not None}
    return InceptionV3(**kw)


_inception_v3.__name__ = "inception_v3"
_inception_v3.__qualname__ = "inception_v3"
inception_v3 = register_model(_inception_v3)
