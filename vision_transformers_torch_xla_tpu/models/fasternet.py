"""FasterNet in Flax, NHWC.

Parity with the reference's dormant fasternet.py (~490 LoC; SURVEY
§2.2): partial convolutions — a 3x3 conv over only dim/n_div channels
(the rest pass through untouched) as the spatial mixer, followed by a
1x1-BN-act-1x1 MLP residual (reference fasternet.py:35-104). 4x4 conv
stem, 2x2 conv patch mergings, 1280-dim conv head.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class FasterNet(nn.Module):
    """Reference fasternet.py:182-360 (FasterNet)."""

    num_classes: int = 1000
    embed_dim: int = 96
    depths: Sequence[int] = (1, 2, 8, 2)
    mlp_ratio: float = 2.0
    n_div: int = 4
    feature_dim: int = 1280
    act: str = "relu"                  # 'relu' | 'gelu'
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        det = deterministic
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=det, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        act = nn.relu if self.act == "relu" else nn.gelu

        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4),
                    padding="VALID", use_bias=False, name="stem",
                    **p)(x.astype(self.dtype))
        x = bn("stem_norm")(x)

        for si, depth in enumerate(self.depths):
            dim = self.embed_dim * 2 ** si
            if si > 0:
                x = nn.Conv(dim, (2, 2), strides=(2, 2), padding="VALID",
                            use_bias=False, name=f"merge{si}", **p)(x)
                x = bn(f"merge{si}_norm")(x)
            pc = dim // self.n_div
            for j in range(depth):
                nm = f"s{si}_b{j}"
                shortcut = x
                x1 = nn.Conv(pc, (3, 3), padding=((1, 1), (1, 1)),
                             use_bias=False, name=f"{nm}_pconv",
                             **p)(x[..., :pc])
                y = jnp.concatenate([x1, x[..., pc:]], axis=-1)
                y = nn.Conv(int(dim * self.mlp_ratio), (1, 1),
                            use_bias=False, name=f"{nm}_fc1", **p)(y)
                y = act(bn(f"{nm}_norm")(y))
                y = nn.Conv(dim, (1, 1), use_bias=False,
                            name=f"{nm}_fc2", **p)(y)
                x = shortcut + y

        x = jnp.mean(x, axis=(1, 2))
        x = act(nn.Dense(self.feature_dim, use_bias=False,
                         name="conv_head", **p)(x))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _fasternet(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return FasterNet(**merged)

    return build


_VARIANTS = {
    "fasternet_t0": dict(embed_dim=40, depths=(1, 2, 8, 2), act="gelu"),
    "fasternet_t1": dict(embed_dim=64, depths=(1, 2, 8, 2), act="gelu"),
    "fasternet_t2": dict(embed_dim=96, depths=(1, 2, 8, 2)),
    "fasternet_s": dict(embed_dim=128, depths=(1, 2, 13, 2)),
    "fasternet_m": dict(embed_dim=144, depths=(3, 4, 18, 3)),
    "fasternet_l": dict(embed_dim=192, depths=(3, 4, 18, 3)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _fasternet(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"FasterNet variant {_name!r} (reference fasternet.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
