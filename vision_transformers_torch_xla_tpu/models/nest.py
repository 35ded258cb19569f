"""NesT (Nested Hierarchical Transformer) in Flax, NHWC.

Parity with the reference's dormant nest.py (651 LoC; SURVEY §2.2):
the image is patchified then partitioned into non-overlapping blocks;
full transformer blocks run independently inside each block (with a
per-block learned pos embed), and levels are connected by a conv +
max-pool "block aggregation" that quarters the number of blocks.
`*_jx` names alias the same builders (reference: same arch, JAX-ported
weights).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Block,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.swin import (
    _window_merge,
    _window_partition,
)

__all__ = []


class Nest(nn.Module):
    embed_dims: Sequence[int] = (96, 192, 384)
    num_heads: Sequence[int] = (3, 6, 12)
    depths: Sequence[int] = (2, 2, 8)
    patch_size: int = 4
    num_blocks_l0: int = 16  # blocks at level 0 (4^(levels-1))
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dims[0], (p, p), strides=p, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="patch_embed")(x)
        grid = x.shape[1]
        side = int(round(self.num_blocks_l0 ** 0.5))
        ws = grid // side  # block side stays constant across levels
        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for li, (dim, heads, depth) in enumerate(zip(self.embed_dims,
                                                     self.num_heads,
                                                     self.depths)):
            if li > 0:
                # block aggregation: conv -> LN -> 3x3 max-pool stride 2
                x = nn.Conv(dim, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"aggregate_conv_{li}")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"aggregate_norm_{li}")(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            hh = x.shape[1]
            t = _window_partition(x, min(ws, hh))  # (B*nb, ws*ws, dim)
            n = t.shape[1]
            nb = t.shape[0] // b
            # per-block AND per-position pos embed (reference nest.py
            # NestLevel: (1, num_blocks, seq_length, dim))
            pos = self.param(f"pos_embed_{li}",
                             nn.with_logical_partitioning(
                                 trunc_init, (None, None, None, "embed")),
                             (1, nb, n, dim), self.param_dtype)
            t = (t.reshape(b, nb, n, dim) + pos.astype(t.dtype)).reshape(
                b * nb, n, dim)
            for blk in range(depth):
                t = Block(heads, self.mlp_ratio,
                          drop_path_rate=float(dpr[bi]), dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"levels_{li}_blocks_{blk}")(
                    t, deterministic)
                bi += 1
            x = _window_merge(t, min(ws, hh), hh, x.shape[2])
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x).astype(jnp.float32)


def _nest(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Nest(**merged)

    return build


_VARIANTS = {
    "nest_tiny": dict(embed_dims=(96, 192, 384), num_heads=(3, 6, 12),
                      depths=(2, 2, 8)),
    "nest_small": dict(embed_dims=(96, 192, 384), num_heads=(3, 6, 12),
                       depths=(2, 2, 20)),
    "nest_base": dict(embed_dims=(128, 256, 512), num_heads=(4, 8, 16),
                      depths=(2, 2, 20)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _nest(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"NesT variant {_name!r} (reference nest.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
    _alias = _nest(_cfg)
    _alias.__name__ = _name + "_jx"
    _alias.__qualname__ = _name + "_jx"
    _alias.__doc__ = f"Alias of {_name} (reference nest.py *_jx twin)."
    setattr(_mod, _name + "_jx", register_model(_alias))
