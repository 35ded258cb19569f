"""Sequencer2D (LSTM token mixing) in Flax, NHWC.

Parity with the reference's dormant sequencer.py (540 LoC; SURVEY §2.2):
blocks replace attention with bidirectional LSTMs run along image rows
and columns (batched over the opposite axis), concatenated and
projected back (reference sequencer.py:67-193). Stages downsample by
per-stage patch sizes (7, 2, 1, 1).

TPU note: the LSTMs run as `flax.linen.RNN` (lax.scan over the spatial
axis) — sequential in H or W (~14-28 steps) but fully batched over
B·W/B·H rows, so each scan step is a large batched matmul.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import Mlp
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class _LSTMCell(nn.RNNCellBase):
    """LSTM cell with torch nn.LSTM parameterization: separate input and
    hidden projections, EACH with a bias (b_ih + b_hh — redundant
    numerically, but it's what torch checkpoints carry), torch gate order
    (i, f, g, o)."""

    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        z = nn.Dense(4 * self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="ih")(x) \
            + nn.Dense(4 * self.hidden, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="hh")(h)
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c2 = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h2 = nn.sigmoid(o) * jnp.tanh(c2)
        return (c2, h2), h2

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        shape = input_shape[:-1] + (self.hidden,)
        return (jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype))

    @property
    def num_feature_axes(self) -> int:
        return 1


class _BiLSTM(nn.Module):
    """Bidirectional LSTM over axis 1 of (N, T, C); concat outputs."""

    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(_LSTMCell(
            self.hidden, dtype=self.dtype, param_dtype=self.param_dtype),
            name="fwd")(x)
        bwd = nn.RNN(_LSTMCell(
            self.hidden, dtype=self.dtype, param_dtype=self.param_dtype),
            name="bwd")(x[:, ::-1])[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class Sequencer2d(nn.Module):
    """Reference sequencer.py:240-420 (Sequencer2d)."""

    num_classes: int = 1000
    layers: Sequence[int] = (4, 3, 8, 3)
    patch_sizes: Sequence[int] = (7, 2, 1, 1)
    embed_dims: Sequence[int] = (192, 384, 384, 384)
    hidden_sizes: Sequence[int] = (48, 96, 96, 96)
    mlp_ratios: Sequence[float] = (3.0, 3.0, 3.0, 3.0)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=1e-6, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        for si, depth in enumerate(self.layers):
            ps = self.patch_sizes[si]
            dim = self.embed_dims[si]
            # reference Sequencer2dStage: downsample=i>0 ALWAYS builds a
            # Downsample2d conv — a 1x1 dim->dim conv for the ps=1 stages
            # (sequencer.py:245-284); the stem PatchEmbed covers stage 0
            x = nn.Conv(dim, (ps, ps), strides=(ps, ps),
                        padding="VALID", name=f"embed_{si}", **p)(x)
            hid = self.hidden_sizes[si]
            for j in range(depth):
                nm = f"s{si}_b{j}"
                b, hh, ww, c = x.shape
                y = nn.LayerNorm(**ln, name=f"{nm}_norm1")(x)
                # vertical: scan over H, batched over B*W
                v = y.transpose(0, 2, 1, 3).reshape(b * ww, hh, c)
                v = _BiLSTM(hid, name=f"{nm}_rnn_v", **p)(v)
                v = v.reshape(b, ww, hh, 2 * hid).transpose(0, 2, 1, 3)
                # horizontal: scan over W, batched over B*H
                h = y.reshape(b * hh, ww, c)
                h = _BiLSTM(hid, name=f"{nm}_rnn_h", **p)(h)
                h = h.reshape(b, hh, ww, 2 * hid)
                y = jnp.concatenate([v, h], axis=-1)
                y = nn.Dense(dim, name=f"{nm}_fc", **p)(y)
                x = x + y
                y = nn.LayerNorm(**ln, name=f"{nm}_norm2")(x)
                y = Mlp(int(dim * self.mlp_ratios[si]), dim,
                        name=f"{nm}_mlp", **p)(y, deterministic)
                x = x + y

        x = nn.LayerNorm(**ln, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **p)(x).astype(jnp.float32)


def _sequencer(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks", "img_size"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return Sequencer2d(**merged)

    return build


_VARIANTS = {
    "sequencer2d_s": dict(layers=(4, 3, 8, 3)),
    "sequencer2d_m": dict(layers=(4, 3, 14, 3)),
    "sequencer2d_l": dict(layers=(8, 8, 16, 4)),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _sequencer(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"Sequencer2D variant {_name!r} (reference sequencer.py "
                   f"registry surface).")
    setattr(_mod, _name, register_model(_fn))
