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
        # token mixing: transpose -> MLP over seq -> transpose back.
        # Hidden width scales with DIM, not seq_len (timm MixerBlock:
        # tokens_dim = mlp_ratio[0]·dim — e.g. 384 for Mixer-B, caught by
        # the published-params anchor in tests/test_param_audit.py)
        y = _layer_norm(self.dtype, self.param_dtype, "norm1")(x)
        y = y.transpose(0, 2, 1)
        y = Mlp(int(self.dim * self.tokens_ratio), self.seq_len,
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


class GluMixerBlock(nn.Module):
    """gMixer block (reference mlp_mixer.py gmixer_* path): MixerBlock
    with SiLU-gated GLU MLPs and (1.0, 4.0) mix ratios."""
    seq_len: int
    dim: int
    tokens_ratio: float = 1.0
    channels_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _glu(self, x, hidden, out, name):
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=self.param_dtype,
                     name=f"{name}_fc1")(x)
        a, g = jnp.split(y, 2, axis=-1)
        y = a * nn.silu(g)
        return nn.Dense(out, dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"{name}_fc2")(y)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _layer_norm(self.dtype, self.param_dtype, "norm1")(x)
        y = y.transpose(0, 2, 1)
        # gate hidden scales with DIM (timm: tokens_dim = mlp_ratio[0]·dim)
        y = self._glu(y, int(self.dim * self.tokens_ratio),
                      self.seq_len, "mlp_tokens")
        y = y.transpose(0, 2, 1)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)
        y = _layer_norm(self.dtype, self.param_dtype, "norm2")(x)
        y = self._glu(y, int(self.dim * self.channels_ratio), self.dim,
                      "mlp_channels")
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class ResBlock(nn.Module):
    """ResMLP block (reference mlp_mixer.py:118-150): Affine pre-norms,
    a single linear token mix, channel MLP, per-branch LayerScale."""
    seq_len: int
    dim: int
    channels_ratio: float = 4.0
    init_values: float = 1e-4
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def _affine(self, x, name):
        a = self.param(f"{name}_alpha", nn.initializers.ones,
                       (self.dim,), self.param_dtype)
        b = self.param(f"{name}_beta", nn.initializers.zeros,
                       (self.dim,), self.param_dtype)
        return x * a.astype(x.dtype) + b.astype(x.dtype)

    def _ls(self, y, name):
        g = self.param(name, nn.initializers.constant(self.init_values),
                       (self.dim,), self.param_dtype)
        return y * g.astype(y.dtype)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = self._affine(x, "norm1").transpose(0, 2, 1)
        y = nn.Dense(self.seq_len, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="linear_tokens")(y).transpose(0, 2, 1)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(self._ls(y, "ls1"), self.drop_path_rate,
                          deterministic, rng)
        y = self._affine(x, "norm2")
        y = Mlp(int(self.dim * self.channels_ratio), self.dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="mlp_channels")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(self._ls(y, "ls2"), self.drop_path_rate,
                             deterministic, rng)


class SpatialGatingBlock(nn.Module):
    """gMLP block (reference mlp_mixer.py:152-186): gated MLP whose gate
    half is LayerNormed and linearly mixed over the sequence."""
    seq_len: int
    dim: int
    mlp_ratio: float = 6.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=True)
        u, v = jnp.split(y, 2, axis=-1)
        v = _layer_norm(self.dtype, self.param_dtype, "gate_norm")(v)
        v = nn.Dense(self.seq_len, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     bias_init=nn.initializers.ones,
                     name="gate_proj")(v.transpose(0, 2, 1)).transpose(0, 2, 1)
        y = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(u * v)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class MlpMixerV(nn.Module):
    """Mixer trunk with selectable block type ('mixer'|'gmixer'|'resmlp'|
    'gmlp') covering the reference's full mlp_mixer.py surface."""
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 512
    depth: int = 8
    block_type: str = "mixer"
    init_values: float = 1e-4
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="stem")(x)
        seq_len = x.shape[1]
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            common = dict(drop_path_rate=dpr, dtype=self.dtype,
                          param_dtype=self.param_dtype, name=f"blocks_{i}")
            if self.block_type == "gmixer":
                x = GluMixerBlock(seq_len, self.embed_dim,
                                  **common)(x, deterministic)
            elif self.block_type == "resmlp":
                x = ResBlock(seq_len, self.embed_dim,
                             init_values=self.init_values,
                             **common)(x, deterministic)
            elif self.block_type == "gmlp":
                x = SpatialGatingBlock(seq_len, self.embed_dim,
                                       **common)(x, deterministic)
            else:
                x = MixerBlock(seq_len, self.embed_dim,
                               **common)(x, deterministic)
        if self.block_type == "resmlp":
            a = self.param("norm_alpha", nn.initializers.ones,
                           (self.embed_dim,), self.param_dtype)
            b = self.param("norm_beta", nn.initializers.zeros,
                           (self.embed_dim,), self.param_dtype)
            x = x * a.astype(x.dtype) + b.astype(x.dtype)
        else:
            x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)
        x = x.mean(axis=1)
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")(x).astype(jnp.float32)


def _mixer_v(_patch, _dim, _depth, _bt, _iv=1e-4, **kw):
    for k in ("pretrained_tag", "global_pool", "remat", "scan_blocks"):
        kw.pop(k, None)
    if kw.get("init_values") is None:
        kw.pop("init_values", None)
    kw.setdefault("init_values", _iv)
    kw.setdefault("patch_size", _patch)
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("block_type", _bt)
    return MlpMixerV(**kw)


_MORE = {
    # reference mlp_mixer.py registrations
    "mixer_l32_224": (32, 1024, 24, "mixer", 1e-4),
    "gmixer_12_224": (16, 384, 12, "gmixer", 1e-4),
    "gmixer_24_224": (16, 384, 24, "gmixer", 1e-4),
    "resmlp_12_224": (16, 384, 12, "resmlp", 1e-4),
    "resmlp_24_224": (16, 384, 24, "resmlp", 1e-5),
    "resmlp_36_224": (16, 384, 36, "resmlp", 1e-6),
    "resmlp_big_24_224": (8, 768, 24, "resmlp", 1e-6),
    "gmlp_ti16_224": (16, 128, 30, "gmlp", 1e-4),
    "gmlp_s16_224": (16, 256, 30, "gmlp", 1e-4),
    "gmlp_b16_224": (16, 512, 30, "gmlp", 1e-4),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, (_p, _d, _dep, _bt, _iv) in _MORE.items():
    def _build(_p=_p, _d=_d, _dep=_dep, _bt=_bt, _iv=_iv, **kw):
        return _mixer_v(_p, _d, _dep, _bt, _iv, **kw)
    _build.__name__ = _name
    _build.__qualname__ = _name
    _build.__doc__ = (f"MLP-family variant {_name!r} (reference "
                      f"mlp_mixer.py registry surface).")
    setattr(_mod, _name, register_model(_build))
