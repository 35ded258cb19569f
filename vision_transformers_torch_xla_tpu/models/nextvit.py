"""NextViT in Flax, NHWC.

Parity with the reference's dormant nextvit.py (~760 LoC; SURVEY §2.2):
the Next Hybrid Strategy — stages of NextConvBlocks (grouped-conv
multi-head convolutional attention + conv MLP, BatchNorm throughout)
ending in NextTransformerBlocks that split channels between efficient
spatially-reduced self-attention (avg-pool sr on k/v) and convolutional
attention, concatenated before the MLP (reference nextvit.py:134-445).
Four-conv stem; per-stage channel schedules with widened tails.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _make_divisible(v, divisor=32):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


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
        x = nn.Conv(self.features, (k, k),
                    strides=(self.stride, self.stride),
                    padding=((k // 2, k // 2),) * 2,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x) if self.act else x


class _PatchEmbed(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        elif x.shape[-1] == self.features:
            return x
        return _ConvBnAct(self.features, 1, act=False, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="proj")(x, deterministic)


class NextViT(nn.Module):
    """Reference nextvit.py:446-640 (NextViT)."""

    num_classes: int = 1000
    stem_chs: Sequence[int] = (64, 32, 64)
    depths: Sequence[int] = (3, 4, 10, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    head_dim: int = 32
    mix_block_ratio: float = 0.75
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        hd = self.head_dim

        stage_out_chs = [
            [96] * self.depths[0],
            [192] * (self.depths[1] - 1) + [256],
            [384, 384, 384, 384, 512] * (self.depths[2] // 5),
            [768] * (self.depths[3] - 1) + [1024],
        ]
        stage_types = [
            ["conv"] * self.depths[0],
            ["conv"] * (self.depths[1] - 1) + ["transformer"],
            ["conv", "conv", "conv", "conv",
             "transformer"] * (self.depths[2] // 5),
            ["conv"] * (self.depths[3] - 1) + ["transformer"],
        ]

        x = x.astype(self.dtype)
        for i, (c, s) in enumerate(zip(
                (self.stem_chs[0], self.stem_chs[1], self.stem_chs[2],
                 self.stem_chs[2]), (2, 1, 1, 2))):
            x = _ConvBnAct(c, 3, s, name=f"stem_{i}", **p)(x, det)

        for si in range(len(self.depths)):
            sr = self.sr_ratios[si]
            for bi, (out, btype) in enumerate(zip(stage_out_chs[si],
                                                  stage_types[si])):
                stride = self.strides[si] if bi == 0 else 1
                nm = f"s{si}_b{bi}"
                if btype == "conv":
                    x = _PatchEmbed(out, stride, name=f"{nm}_pe",
                                    **p)(x, det)
                    y = _ConvBnAct(out, 3, groups=out // hd, act=False,
                                   name=f"{nm}_mhca_g", **p)(x, det)
                    y = nn.relu(y)
                    y = nn.Conv(out, (1, 1), use_bias=False,
                                name=f"{nm}_mhca_proj", **p)(y)
                    x = x + y
                    y = nn.BatchNorm(use_running_average=det,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"{nm}_norm")(x)
                    y = nn.relu(nn.Conv(out * 3, (1, 1),
                                        name=f"{nm}_mlp_fc1", **p)(y))
                    y = nn.Conv(out, (1, 1), name=f"{nm}_mlp_fc2",
                                **p)(y)
                    x = x + y
                else:
                    mhsa_chs = _make_divisible(
                        int(out * self.mix_block_ratio))
                    mhca_chs = out - mhsa_chs
                    x = _PatchEmbed(mhsa_chs, stride, name=f"{nm}_pe",
                                    **p)(x, det)
                    b, hh, ww, c = x.shape
                    y = nn.BatchNorm(use_running_average=det,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"{nm}_norm1")(x)
                    t = y.reshape(b, hh * ww, c)
                    heads = c // hd
                    q = nn.Dense(c, name=f"{nm}_q", **p)(t)
                    kv_in = t
                    if sr > 1:
                        n2 = (hh * ww) // (sr * sr)
                        kv_in = t.reshape(b, n2, sr * sr, c).mean(axis=2)
                        kv_in = nn.BatchNorm(
                            use_running_average=det, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"{nm}_sr_norm")(kv_in)
                    k = nn.Dense(c, name=f"{nm}_k", **p)(kv_in)
                    v = nn.Dense(c, name=f"{nm}_v", **p)(kv_in)
                    q = q.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
                    k = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
                    v = v.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
                    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                   preferred_element_type=jnp.float32)
                    pr = jax.nn.softmax(s * hd ** -0.5, axis=-1)
                    o = jnp.einsum("bhqk,bhkd->bhqd", pr.astype(v.dtype),
                                   v, preferred_element_type=jnp.float32)
                    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(
                        b, hh * ww, c)
                    o = nn.Dense(c, name=f"{nm}_attn_proj", **p)(o)
                    x = x + o.reshape(b, hh, ww, c)

                    y = _PatchEmbed(mhca_chs, 1, name=f"{nm}_proj",
                                    **p)(x, det)
                    z = _ConvBnAct(mhca_chs, 3, groups=mhca_chs // hd,
                                   act=False, name=f"{nm}_mhca_g",
                                   **p)(y, det)
                    z = nn.relu(z)
                    z = nn.Conv(mhca_chs, (1, 1), use_bias=False,
                                name=f"{nm}_mhca_proj", **p)(z)
                    y = y + z
                    x = jnp.concatenate([x, y], axis=-1)
                    y = nn.BatchNorm(use_running_average=det,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"{nm}_norm2")(x)
                    y = nn.relu(nn.Conv(out * 2, (1, 1),
                                        name=f"{nm}_mlp_fc1", **p)(y))
                    y = nn.Conv(out, (1, 1), name=f"{nm}_mlp_fc2",
                                **p)(y)
                    x = x + y

        x = nn.BatchNorm(use_running_average=det, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _nextvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return NextViT(**merged)

    return build


_VARIANTS = {
    "nextvit_small": dict(depths=(3, 4, 10, 3)),
    "nextvit_base": dict(depths=(3, 4, 20, 3)),
    "nextvit_large": dict(depths=(3, 4, 30, 3)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _nextvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"NextViT variant {_name!r} (reference nextvit.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
