"""FastViT in Flax, NHWC (train-time multi-branch form).

Parity with the reference's dormant fastvit.py (~1600 LoC; SURVEY §2.2):
MobileOne blocks (overparameterized kxk + 1x1-scale + BN-identity
branches summed before the act — foldable to one conv at inference),
RepMixer token mixing x + ls·(mixer(x) − norm(x)), large-kernel
reparam patch embeds (7x7 dw + 3x3 branch), conv FFNs with a 7x7
depthwise prologue, optional attention stages with a reparam
conditional position encoding, SE final conv expansion (reference
fastvit.py:34-273, 601-712, 1095-1207).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _ConvBn(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
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
        return nn.BatchNorm(use_running_average=deterministic,
                            momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="bn")(x)


class MobileOneBlock(nn.Module):
    """Train-time multi-branch MobileOne block (reference
    fastvit.py:34-160)."""

    out_chs: int
    kernel: int
    stride: int = 1
    depthwise: bool = False
    use_se: bool = False
    use_act: bool = True
    use_scale_branch: bool = True
    num_conv_branches: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_chs = x.shape[-1]
        groups = in_chs if self.depthwise else 1
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out = 0.0
        if in_chs == self.out_chs and self.stride == 1:
            out = nn.BatchNorm(use_running_average=deterministic,
                               momentum=0.9, epsilon=1e-5,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="identity")(x)
        if self.kernel > 1 and self.use_scale_branch:
            out = out + _ConvBn(self.out_chs, 1, self.stride, groups,
                                name="scale", **p)(x, deterministic)
        for i in range(self.num_conv_branches):
            out = out + _ConvBn(self.out_chs, self.kernel, self.stride,
                                groups, name=f"conv_{i}",
                                **p)(x, deterministic)
        if self.use_se:
            s = jnp.mean(out, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(max(self.out_chs // 16, 8), (1, 1),
                                name="se_reduce", **p)(s))
            s = nn.Conv(self.out_chs, (1, 1), name="se_expand", **p)(s)
            out = out * jax.nn.sigmoid(
                s.astype(jnp.float32)).astype(out.dtype)
        return nn.gelu(out) if self.use_act else out


class _LargeKernelConv(nn.Module):
    """ReparamLargeKernelConv: dw kxk + dw 3x3 branches summed
    (reference fastvit.py:275-424)."""

    out_chs: int
    kernel: int = 7
    stride: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        groups = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out = _ConvBn(self.out_chs, self.kernel, self.stride, groups,
                      name="large", **p)(x, deterministic)
        out = out + _ConvBn(self.out_chs, 3, self.stride, groups,
                            name="small", **p)(x, deterministic)
        return out


class _ConvMlp(nn.Module):
    """7x7 dw prologue + 1x1 expand/project (reference
    fastvit.py:713-764)."""

    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = x.shape[-1]
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = _ConvBn(c, 7, 1, c, name="conv", **p)(x, deterministic)
        y = nn.Conv(self.hidden, (1, 1), name="fc1", **p)(y)
        y = nn.gelu(y)
        return nn.Conv(c, (1, 1), name="fc2", **p)(y)


class FastVit(nn.Module):
    """Reference fastvit.py:1095-1300 (FastVit)."""

    num_classes: int = 1000
    layers: Sequence[int] = (2, 2, 4, 2)
    embed_dims: Sequence[int] = (48, 96, 192, 384)
    mlp_ratios: Sequence[float] = (3, 3, 3, 3)
    token_mixers: Sequence[str] = ("repmixer",) * 4
    pos_emb_stage: Optional[int] = None   # stage index with RepCPE
    se_downsamples: Sequence[bool] = (False, False, False, False)
    lkc_use_act: bool = False
    layer_scale_init: float = 1e-5
    cls_ratio: float = 2.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _ls(self, name, dim, x):
        g = self.param(name, nn.initializers.constant(
            self.layer_scale_init), (dim,), self.param_dtype)
        return x * g.astype(x.dtype)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d0 = self.embed_dims[0]
        x = x.astype(self.dtype)
        x = MobileOneBlock(d0, 3, 2, name="stem0", **p)(x, det)
        x = MobileOneBlock(d0, 3, 2, depthwise=True, name="stem1",
                           **p)(x, det)
        x = MobileOneBlock(d0, 1, 1, name="stem2", **p)(x, det)

        for si, dim in enumerate(self.embed_dims):
            if si > 0:
                x = _LargeKernelConv(dim, 7, 2, name=f"pe{si}_lkc",
                                     **p)(x, det)
                if self.lkc_use_act:
                    x = nn.gelu(x)
                if self.se_downsamples[si]:
                    s = x.mean(axis=(1, 2), keepdims=True)
                    s = nn.relu(nn.Conv(max(1, dim // 16), (1, 1),
                                        name=f"pe{si}_se_fc1", **p)(s))
                    s = nn.sigmoid(nn.Conv(dim, (1, 1),
                                           name=f"pe{si}_se_fc2", **p)(s))
                    x = x * s
                x = MobileOneBlock(dim, 1, 1, name=f"pe{si}_pw",
                                   **p)(x, det)
            if self.pos_emb_stage == si:
                # RepCPE: 7x7 dw conv + identity (reference :765-880)
                x = x + nn.Conv(dim, (7, 7), padding=((3, 3), (3, 3)),
                                feature_group_count=dim,
                                name=f"pos_emb_{si}", **p)(x)
            mixer = self.token_mixers[si]
            hidden = int(dim * self.mlp_ratios[si])
            for j in range(self.layers[si]):
                nm = f"s{si}_b{j}"
                if mixer == "repmixer":
                    mix = MobileOneBlock(dim, 3, 1, depthwise=True,
                                         use_act=False,
                                         name=f"{nm}_mixer",
                                         **p)(x, det)
                    norm = MobileOneBlock(dim, 3, 1, depthwise=True,
                                          use_act=False,
                                          use_scale_branch=False,
                                          num_conv_branches=0,
                                          name=f"{nm}_norm", **p)(x, det)
                    x = x + self._ls(f"{nm}_ls_mix", dim, mix - norm)
                else:
                    y = nn.BatchNorm(use_running_average=det,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"{nm}_norm")(x)
                    b, hh, ww, c = y.shape
                    h = 8  # fastvit attention head dim 32 -> dim/32 heads
                    h = max(1, c // 32)
                    t = y.reshape(b, hh * ww, c)
                    qkv = nn.Dense(3 * c, name=f"{nm}_qkv", **p)(t)
                    qkv = qkv.reshape(b, hh * ww, 3, h, c // h)
                    qkv = qkv.transpose(2, 0, 3, 1, 4)
                    q, k, v = qkv[0], qkv[1], qkv[2]
                    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                   preferred_element_type=jnp.float32)
                    pr = jax.nn.softmax(s * ((c // h) ** -0.5), axis=-1)
                    o = jnp.einsum("bhqk,bhkd->bhqd", pr.astype(v.dtype),
                                   v, preferred_element_type=jnp.float32)
                    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(
                        b, hh, ww, c)
                    o = nn.Dense(c, name=f"{nm}_attn_proj", **p)(o)
                    x = x + self._ls(f"{nm}_ls_attn", dim, o)
                y = _ConvMlp(hidden, name=f"{nm}_mlp", **p)(x, det)
                x = x + self._ls(f"{nm}_ls_mlp", dim, y)

        final = int(self.embed_dims[-1] * self.cls_ratio)
        x = MobileOneBlock(final, 3, 1, depthwise=True, use_se=True,
                           name="final_conv", **p)(x, det)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _fastvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return FastVit(**merged)

    return build


_SA = dict(pos_emb_stage=3,
           token_mixers=("repmixer", "repmixer", "repmixer", "attention"))
_VARIANTS = {
    "fastvit_t8": dict(layers=(2, 2, 4, 2), embed_dims=(48, 96, 192, 384),
                       mlp_ratios=(3, 3, 3, 3)),
    "fastvit_t12": dict(layers=(2, 2, 6, 2),
                        embed_dims=(64, 128, 256, 512),
                        mlp_ratios=(3, 3, 3, 3)),
    "fastvit_s12": dict(layers=(2, 2, 6, 2),
                        embed_dims=(64, 128, 256, 512),
                        mlp_ratios=(4, 4, 4, 4)),
    "fastvit_sa12": dict(layers=(2, 2, 6, 2),
                         embed_dims=(64, 128, 256, 512),
                         mlp_ratios=(4, 4, 4, 4), **_SA),
    "fastvit_sa24": dict(layers=(4, 4, 12, 4),
                         embed_dims=(64, 128, 256, 512),
                         mlp_ratios=(4, 4, 4, 4), **_SA),
    "fastvit_sa36": dict(layers=(6, 6, 18, 6),
                         embed_dims=(64, 128, 256, 512),
                         mlp_ratios=(4, 4, 4, 4), **_SA),
    "fastvit_ma36": dict(layers=(6, 6, 18, 6),
                         embed_dims=(76, 152, 304, 608),
                         mlp_ratios=(4, 4, 4, 4), **_SA),
    # MobileCLIP image towers (reference fastvit.py mci registrations)
    "fastvit_mci0": dict(layers=(2, 6, 10, 2),
                         embed_dims=(64, 128, 256, 512),
                         mlp_ratios=(3, 3, 3, 3),
                         se_downsamples=(False, False, True, True),
                         lkc_use_act=True, **_SA),
    "fastvit_mci1": dict(layers=(4, 12, 20, 4),
                         embed_dims=(64, 128, 256, 512),
                         mlp_ratios=(3, 3, 3, 3),
                         se_downsamples=(False, False, True, True),
                         lkc_use_act=True, **_SA),
    "fastvit_mci2": dict(layers=(4, 12, 24, 4),
                         embed_dims=(80, 160, 320, 640),
                         mlp_ratios=(3, 3, 3, 3),
                         se_downsamples=(False, False, True, True),
                         lkc_use_act=True, **_SA),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _fastvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"FastViT variant {_name!r} (reference fastvit.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
