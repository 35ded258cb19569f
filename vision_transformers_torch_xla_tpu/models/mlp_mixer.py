"""MLP-Mixer in Flax.

Parity with the reference's dormant mlp_mixer.py (846 LoC): token-mixing MLP
over the sequence axis + channel-mixing MLP per token, pre-LN, stochastic
depth. Pure matmuls — ideal for the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    PatchEmbed,
    _layer_norm,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


class MixerBlock(nn.Module):
    seq_len: int
    dim: int
    tokens_ratio: float = 0.5
    channels_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # token mixing: transpose -> MLP over seq -> transpose back
        y = _layer_norm(self.dtype, self.param_dtype, "norm1")(x)
        y = y.transpose(0, 2, 1)
        y = Mlp(int(self.seq_len * self.tokens_ratio), self.seq_len,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp_tokens")(y, deterministic)
        y = y.transpose(0, 2, 1)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)

        y = _layer_norm(self.dtype, self.param_dtype, "norm2")(x)
        y = Mlp(int(self.dim * self.channels_ratio), self.dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp_channels")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class MlpMixer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 512
    depth: int = 8
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="stem")(x)
        seq_len = x.shape[1]
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = MixerBlock(seq_len, self.embed_dim, drop_path_rate=dpr,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"blocks_{i}")(x, deterministic)
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        x = x.mean(axis=1)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _mixer(patch, dim, depth, **kw):
    kw.pop("pretrained_tag", None)
    kw.pop("global_pool", None)
    kw.pop("init_values", None)
    kw.pop("remat", None)
    return MlpMixer(patch_size=patch, embed_dim=dim, depth=depth, **kw)


@register_model
def mixer_s32_224(**kw):
    return _mixer(32, 512, 8, **kw)


@register_model
def mixer_s16_224(**kw):
    return _mixer(16, 512, 8, **kw)


@register_model
def mixer_b32_224(**kw):
    return _mixer(32, 768, 12, **kw)


@register_model
def mixer_b16_224(**kw):
    return _mixer(16, 768, 12, **kw)


@register_model
def mixer_l16_224(**kw):
    return _mixer(16, 1024, 24, **kw)
