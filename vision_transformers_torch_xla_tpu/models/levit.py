"""LeViT in Flax, NHWC.

Parity with the reference's dormant levit.py (1001 LoC; SURVEY §2.2):
a conv-stem hybrid ViT built for fast inference —

* 4-conv stride-16 stem with hardswish
* BatchNorm after every linear (the LeViT signature; foldable at
  inference)
* attention with learned per-head position biases indexed by absolute
  coordinate offsets
* shrink-attention downsample blocks between stages (queries from a
  stride-2 subsample of the tokens)

`levit_conv_*` names are registered as aliases of the same builders (the
reference pair differs only in whether Linear+BN is expressed as 1x1
conv; the math is identical).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _bias_index(r: int, stride: int = 1) -> np.ndarray:
    """(Nq, Nk) index into a per-offset bias table for an r x r key grid.

    Queries sit on the stride-subsampled grid. Offset id = |dx| * r + |dy|
    (reference levit.py attention_bias_idxs construction).
    """
    ky, kx = np.meshgrid(np.arange(r), np.arange(r), indexing="ij")
    kpts = np.stack([ky.reshape(-1), kx.reshape(-1)], 1)
    qpts = kpts[::1] if stride == 1 else np.stack(
        [c.reshape(-1) for c in np.meshgrid(np.arange(0, r, stride),
                                            np.arange(0, r, stride),
                                            indexing="ij")], 1)
    d = np.abs(qpts[:, None, :] - kpts[None, :, :])
    return d[..., 0] * r + d[..., 1]


class _LinBN(nn.Module):
    """Linear -> BatchNorm (LeViT's fusable primitive)."""
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear")(x)
        shape = y.shape
        y = y.reshape(-1, shape[-1])
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(y)
        return y.reshape(shape)


class LevitAttention(nn.Module):
    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float
    resolution: int
    stride: int = 1  # 2 -> shrink attention (downsample block)
    out_dim: int = 0
    act: str = "hswish"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        h, kd = self.num_heads, self.key_dim
        vd = int(self.attn_ratio * kd)
        r = self.resolution
        lin = partial(_LinBN, dtype=self.dtype, param_dtype=self.param_dtype)

        kv = lin(h * (kd + vd), name="kv")(x, deterministic)
        k, v = jnp.split(kv.reshape(b, n, h, kd + vd), [kd], axis=-1)
        if self.stride > 1:
            xq = x.reshape(b, r, r, c)[:, ::self.stride, ::self.stride]
            xq = xq.reshape(b, -1, c)
        else:
            xq = x
        q = lin(h * kd, name="q")(xq, deterministic).reshape(
            b, xq.shape[1], h, kd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (kd ** -0.5)
        idx = _bias_index(r, self.stride)
        table = self.param("attention_biases", nn.initializers.zeros,
                           (h, r * r), self.param_dtype)
        attn = attn + table[:, idx.reshape(-1)].reshape(
            h, idx.shape[0], idx.shape[1])[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, -1, h * vd).astype(x.dtype)
        out = _hswish(out) if self.act == "hswish" else nn.silu(out)
        return lin(self.out_dim or self.dim, name="proj")(out, deterministic)


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


class Levit(nn.Module):
    embed_dims: Sequence[int] = (128, 256, 384)
    key_dim: int = 16
    num_heads: Sequence[int] = (4, 6, 8)
    depths: Sequence[int] = (2, 3, 4)
    attn_ratio: float = 2.0
    mlp_ratio: float = 2.0
    num_classes: int = 1000
    # the reference builds LevitDistilled by default (create_levit
    # distilled=True, levit.py:822) — timm's pretrained weights and
    # published param counts all include the head/head_dist pair
    distillation: bool = True
    act: str = "hswish"                # 'silu' for the 512/256d experiments
    stem_stride: int = 16              # 16: 4-conv stem; 8: 3-conv stem
    img_size: int = 224
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _head(self, x, deterministic, name):
        # NormLinear (reference levit.py:93-120): BN1d then biased Linear
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"{name}_bn")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=name)(x)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.astype(self.dtype)
        act = _hswish if self.act == "hswish" else nn.silu
        c0 = self.embed_dims[0]
        # 4-conv stride-16 stem (reference levit.py stem_b16); the _s8
        # names use a 3-conv stride-8 stem
        plan = ((c0 // 8, c0 // 4, c0 // 2, c0) if self.stem_stride == 16
                else (c0 // 4, c0 // 2, c0))
        for i, ch in enumerate(plan):
            x = nn.Conv(ch, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"stem_conv{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"stem_bn{i}")(x)
            if i < len(plan) - 1:
                x = act(x)
        b, hh, ww, _ = x.shape
        x = x.reshape(b, hh * ww, c0)
        r = hh

        lin = partial(_LinBN, dtype=self.dtype, param_dtype=self.param_dtype)
        for si, (dim, heads, depth) in enumerate(zip(self.embed_dims,
                                                     self.num_heads,
                                                     self.depths)):
            if si > 0:
                # shrink attention downsample: r -> r//2, dim up (reference
                # LevitDownsample: attn_ratio 4, mlp_ratio 2,
                # heads = in_dim // key_dim; levit.py:483-496)
                x = LevitAttention(
                    self.embed_dims[si - 1], self.key_dim,
                    self.embed_dims[si - 1] // self.key_dim,
                    attn_ratio=4.0, resolution=r, stride=2, out_dim=dim,
                    act=self.act,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"downsample_{si}_attn")(x, deterministic)
                r = (r + 1) // 2
                y = lin(int(dim * 2.0),
                        name=f"downsample_{si}_mlp_fc1")(x, deterministic)
                x = x + lin(dim, name=f"downsample_{si}_mlp_fc2")(
                    act(y), deterministic)
            for blk in range(depth):
                name = f"stages_{si}_blocks_{blk}"
                x = x + LevitAttention(dim, self.key_dim, heads,
                                       self.attn_ratio, r, act=self.act,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=f"{name}_attn")(x, deterministic)
                y = lin(int(dim * self.mlp_ratio),
                        name=f"{name}_mlp_fc1")(x, deterministic)
                x = x + lin(dim, name=f"{name}_mlp_fc2")(act(y),
                                                         deterministic)
        x = x.mean(axis=1)
        if self.num_classes == 0:
            return x
        head = self._head(x, deterministic, "head")
        if self.distillation:
            head = (head + self._head(x, deterministic, "head_dist")) / 2
        return head.astype(jnp.float32)


def _levit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Levit(**merged)

    return build


# reference model_cfgs (levit.py:783-812): key_dim is per-variant (16 for
# the 128s/128, 32 for 192/256/384, 64 for the 512 experiments) and the
# 512_s8/512d experiments use narrower later stages than the plain 512
_VARIANTS = {
    "levit_128s": dict(embed_dims=(128, 256, 384), num_heads=(4, 6, 8),
                       depths=(2, 3, 4), key_dim=16),
    "levit_128": dict(embed_dims=(128, 256, 384), num_heads=(4, 8, 12),
                      depths=(4, 4, 4), key_dim=16),
    "levit_192": dict(embed_dims=(192, 288, 384), num_heads=(3, 5, 6),
                      depths=(4, 4, 4), key_dim=32),
    "levit_256": dict(embed_dims=(256, 384, 512), num_heads=(4, 6, 8),
                      depths=(4, 4, 4), key_dim=32),
    "levit_384": dict(embed_dims=(384, 512, 768), num_heads=(6, 9, 12),
                      depths=(4, 4, 4), key_dim=32),
    "levit_256d": dict(embed_dims=(256, 384, 512), num_heads=(4, 6, 8),
                       depths=(4, 8, 6), key_dim=32, act="silu"),
    "levit_512": dict(embed_dims=(512, 768, 1024), num_heads=(8, 12, 16),
                      depths=(4, 4, 4), key_dim=64, act="silu"),
    "levit_512d": dict(embed_dims=(512, 640, 768), num_heads=(8, 10, 12),
                       depths=(4, 8, 6), key_dim=64, act="silu"),
    "levit_384_s8": dict(embed_dims=(384, 512, 768), num_heads=(6, 9, 12),
                         depths=(4, 4, 4), key_dim=32, act="silu",
                         stem_stride=8),
    "levit_512_s8": dict(embed_dims=(512, 640, 896),
                         num_heads=(8, 10, 14), depths=(4, 4, 4),
                         key_dim=64, act="silu", stem_stride=8),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _levit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"LeViT variant {_name!r} (reference levit.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
    # levit_conv_* aliases: identical math, conv-expressed in the reference
    _alias = _levit(_cfg)
    _conv_name = _name.replace("levit_", "levit_conv_")
    _alias.__name__ = _conv_name
    _alias.__qualname__ = _conv_name
    _alias.__doc__ = (f"Alias of {_name} (reference levit.py conv-expressed "
                      f"twin).")
    setattr(_mod, _conv_name, register_model(_alias))
