"""MambaOut in Flax, NHWC.

Parity with the reference's dormant mambaout.py (~640 LoC; SURVEY §2.2):
gated CNN blocks — LN, fc1 to 2x hidden split into (gate, identity,
conv) slices, a 7x7 depthwise conv on the conv slice, gelu(gate) *
concat(identity, conv) through fc2, residual (reference
mambaout.py:179-231). Two-conv stem with mid-norm, norm-first
downsamples, MLP head with a 4x expansion fc + LN.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class MambaOut(nn.Module):
    """Reference mambaout.py:283-450 (MambaOut)."""

    num_classes: int = 1000
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 576)
    expansion_ratio: float = 8 / 3
    kernel_size: int = 7
    conv_ratio: float = 1.0
    stem_mid_norm: bool = True
    downsample: str = "norm_conv"      # 'norm_conv' | 'conv_nf' (no norm)
    ls_init_value: float = 0.0         # per-block LayerScale (rw variants)
    act: str = "gelu"
    head_fn: str = "mlp"               # 'mlp' | 'norm_mlp' | 'default'
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=1e-6, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        d0 = self.dims[0]
        x = nn.Conv(d0 // 2, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), name="stem_conv1",
                    **p)(x.astype(self.dtype))
        if self.stem_mid_norm:
            x = nn.LayerNorm(**ln, name="stem_norm1")(x)
        x = nn.gelu(x)
        x = nn.Conv(d0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="stem_conv2", **p)(x)
        x = nn.LayerNorm(**ln, name="stem_norm2")(x)

        ks = self.kernel_size
        act = nn.silu if self.act == "silu" else nn.gelu
        for si, dim in enumerate(self.dims):
            if si > 0:
                if self.downsample != "conv_nf":
                    x = nn.LayerNorm(**ln, name=f"down{si}_norm")(x)
                x = nn.Conv(dim, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            name=f"down{si}", **p)(x)
            hidden = int(self.expansion_ratio * dim)
            cc = int(self.conv_ratio * dim)
            for j in range(self.depths[si]):
                nm = f"s{si}_b{j}"
                shortcut = x
                y = nn.LayerNorm(**ln, name=f"{nm}_norm")(x)
                y = nn.Dense(hidden * 2, name=f"{nm}_fc1", **p)(y)
                g = y[..., :hidden]
                i = y[..., hidden:2 * hidden - cc]
                c = y[..., 2 * hidden - cc:]
                c = nn.Conv(cc, (ks, ks), padding=((ks // 2,) * 2,) * 2,
                            feature_group_count=cc,
                            name=f"{nm}_conv", **p)(c)
                y = act(g) * jnp.concatenate([i, c], axis=-1)
                y = nn.Dense(dim, name=f"{nm}_fc2", **p)(y)
                if self.ls_init_value:
                    gam = self.param(f"{nm}_ls", nn.initializers.constant(
                        self.ls_init_value), (dim,), self.param_dtype)
                    y = y * gam.astype(y.dtype)
                x = shortcut + y

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(**ln, name="head_pre_norm")(x)
        if self.head_fn in ("mlp", "norm_mlp"):
            x = nn.gelu(nn.Dense(int(4 * self.dims[-1]), name="head_fc1",
                                 **p)(x))
            x = nn.LayerNorm(**ln, name="head_norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _mambaout(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return MambaOut(**merged)

    return build


_VARIANTS = {
    "mambaout_femto": dict(depths=(3, 3, 9, 3), dims=(48, 96, 192, 288)),
    "mambaout_kobe": dict(depths=(3, 3, 15, 3), dims=(48, 96, 192, 288)),
    "mambaout_tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 576)),
    "mambaout_small": dict(depths=(3, 4, 27, 3),
                           dims=(96, 192, 384, 576)),
    "mambaout_base": dict(depths=(3, 4, 27, 3), dims=(128, 256, 512, 768)),
    "mambaout_small_rw": dict(depths=(3, 4, 27, 3),
                              dims=(96, 192, 384, 576),
                              stem_mid_norm=False, head_fn="default"),
    "mambaout_base_short_rw": dict(depths=(3, 3, 25, 3),
                                   dims=(128, 256, 512, 768),
                                   expansion_ratio=3.0,
                                   stem_mid_norm=False,
                                   head_fn="default"),
    # reference mambaout.py rw/test variants (conv_nf downsample +
    # LayerScale + norm_mlp heads)
    "mambaout_base_tall_rw": dict(depths=(3, 4, 30, 3),
                                  dims=(128, 256, 512, 768),
                                  expansion_ratio=2.5, conv_ratio=1.25,
                                  stem_mid_norm=False,
                                  downsample="conv_nf",
                                  ls_init_value=1e-6, head_fn="norm_mlp"),
    "mambaout_base_wide_rw": dict(depths=(3, 4, 27, 3),
                                  dims=(128, 256, 512, 768),
                                  expansion_ratio=3.0, conv_ratio=1.5,
                                  stem_mid_norm=False,
                                  downsample="conv_nf",
                                  ls_init_value=1e-6, act="silu",
                                  head_fn="norm_mlp"),
    "mambaout_base_plus_rw": dict(depths=(3, 4, 30, 3),
                                  dims=(128, 256, 512, 768),
                                  expansion_ratio=3.0, conv_ratio=1.5,
                                  stem_mid_norm=False,
                                  downsample="conv_nf",
                                  ls_init_value=1e-6, act="silu",
                                  head_fn="norm_mlp"),
    "test_mambaout": dict(depths=(1, 1, 3, 1), dims=(16, 32, 48, 64),
                          expansion_ratio=3.0, stem_mid_norm=False,
                          downsample="conv_nf", ls_init_value=1e-4,
                          act="silu", head_fn="norm_mlp"),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _mambaout(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MambaOut variant {_name!r} (reference mambaout.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
