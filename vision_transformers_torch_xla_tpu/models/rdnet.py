"""RDNet (DenseNets Reloaded) in Flax, NHWC.

Parity with the reference's dormant rdnet.py (513 LoC; SURVEY §2.2):
revived dense connectivity — many shallow stages whose blocks are
ConvNeXt-style (dw 7x7 + LN + 1x1 expand + GELU + 1x1 growth,
optionally effective-SE gated) with LayerScale, each block's output
concatenated onto the stage features; LN + 1x1 compression transitions
(stride-2 at the downsample stages); 4x patch stem; pool-then-LN head
(reference rdnet.py:23-280).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class RDNet(nn.Module):
    """Reference rdnet.py:135-280 (RDNet)."""

    num_classes: int = 1000
    num_init_features: int = 64
    growth_rates: Sequence[int] = (64, 104, 128, 128, 128, 128, 224)
    num_blocks_list: Sequence[int] = (3,) * 7
    block_type: Sequence[str] = ("block",) * 2 + ("blockese",) * 5
    is_downsample_block: Sequence = (None, True, True, False, False,
                                     False, True)
    bottleneck_width_ratio: float = 4.0
    transition_compression_ratio: float = 0.5
    ls_init_value: float = 1e-6
    patch_size: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=1e-6, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        ps = self.patch_size
        x = nn.Conv(self.num_init_features, (ps, ps), strides=(ps, ps),
                    padding="VALID", name="stem",
                    **p)(x.astype(self.dtype))
        x = nn.LayerNorm(**ln, name="stem_norm")(x)

        for si in range(len(self.num_blocks_list)):
            if si != 0:
                nf = x.shape[-1]
                comp = int(nf * self.transition_compression_ratio / 8) * 8
                k = 2 if self.is_downsample_block[si] else 1
                x = nn.LayerNorm(**ln, name=f"tr{si}_norm")(x)
                x = nn.Conv(comp, (k, k), strides=(k, k), padding="VALID",
                            name=f"tr{si}_conv", **p)(x)
            growth = self.growth_rates[si]
            ese = self.block_type[si].lower() == "blockese"
            for bi in range(self.num_blocks_list[si]):
                nm = f"s{si}_b{bi}"
                c = x.shape[-1]
                inter = int(c * self.bottleneck_width_ratio / 8) * 8
                y = nn.Conv(c, (7, 7), padding=((3, 3), (3, 3)),
                            feature_group_count=c, name=f"{nm}_dw",
                            **p)(x)
                y = nn.LayerNorm(**ln, name=f"{nm}_norm")(y)
                y = nn.gelu(nn.Conv(inter, (1, 1), name=f"{nm}_fc1",
                                    **p)(y))
                y = nn.Conv(growth, (1, 1), name=f"{nm}_fc2", **p)(y)
                if ese:
                    s = jnp.mean(y, axis=(1, 2), keepdims=True)
                    s = nn.Conv(growth, (1, 1), name=f"{nm}_ese",
                                **p)(s)
                    y = y * jnp.clip(
                        s.astype(jnp.float32) / 6 + 0.5, 0, 1
                    ).astype(y.dtype)
                if self.ls_init_value:
                    g = self.param(f"{nm}_gamma",
                                   nn.initializers.constant(
                                       self.ls_init_value),
                                   (growth,), self.param_dtype)
                    y = y * g.astype(y.dtype)
                x = jnp.concatenate([x, y], axis=-1)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(**ln, name="head_norm")(x)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _rdnet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return RDNet(**merged)

    return build


_VARIANTS = {
    "rdnet_tiny": dict(
        num_init_features=64,
        growth_rates=(64, 104, 128, 128, 128, 128, 224),
        num_blocks_list=(3,) * 7,
        is_downsample_block=(None, True, True, False, False, False, True),
        block_type=("block",) * 2 + ("blockese",) * 5),
    "rdnet_small": dict(
        num_init_features=72,
        growth_rates=(64, 128) + (128,) * 7 + (240,) * 2,
        num_blocks_list=(3,) * 11,
        is_downsample_block=(None, True, True, False, False, False,
                             False, False, False, True, False),
        block_type=("block",) * 2 + ("blockese",) * 9),
    "rdnet_base": dict(
        num_init_features=120,
        growth_rates=(96, 128) + (168,) * 7 + (336,) * 2,
        num_blocks_list=(3,) * 11,
        is_downsample_block=(None, True, True, False, False, False,
                             False, False, False, True, False),
        block_type=("block",) * 2 + ("blockese",) * 9),
    "rdnet_large": dict(
        num_init_features=144,
        growth_rates=(128, 192) + (256,) * 8 + (360,) * 2,
        num_blocks_list=(3,) * 12,
        is_downsample_block=(None, True, True, False, False, False,
                             False, False, False, False, True, False),
        block_type=("block",) * 2 + ("blockese",) * 10),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _rdnet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"RDNet variant {_name!r} (reference rdnet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
