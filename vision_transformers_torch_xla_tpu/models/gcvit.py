"""GCViT (Global Context ViT) in Flax, NHWC.

Parity with the reference's gcvit.py (651 LoC; SURVEY §2.2): stages
alternate local window attention with global-context attention — a
per-stage global query (generated from the full feature map by an
MbConv + max-pool pyramid down to one window's resolution) is shared
across all windows as Q while K/V stay window-local.

Structure (reference gcvit.py):

* MbConvBlock (:41-74): 3x3 depthwise (bias-free) -> gelu -> SE (rd 0.25,
  bias-free) -> 1x1 pointwise (bias-free), residual.
* Downsample2d (:77-107): LN -> MbConv -> stride-2 3x3 conv (bias-free)
  -> LN; used by the stem (stride-4 total with conv1) and by stages 2-4
  (doubling the width).
* FeatureBlock (:110-133): max(1, log2(feat/window)) MbConvs, each
  followed by a 3x3/2 max-pool while reductions remain.
* WindowAttentionGlobal (:154-208): fused qkv (local) or kv + shared
  global q, with a per-block relative position bias table.
* stage_norm on the LAST stage only (:435), applied channels-last before
  the classifier's pooling; norm eps 1e-5 throughout.

One deliberate divergence: the reference broadcasts the global query
with `repeat`, which interleaves queries window-major against the
batch-major window layout (mixing images for batch > 1); here the
query is broadcast per-image.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    Mlp,
    drop_path,
    trunc_init,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.swin import (
    _window_merge,
    _window_partition,
)

__all__ = []


def _rel_pos_index(ws: int) -> np.ndarray:
    """(N, N) index into the (2ws-1)^2 rel-pos table (timm RelPosBias)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel + (ws - 1)
    return rel[0] * (2 * ws - 1) + rel[1]


class MbConv(nn.Module):
    """dw3x3 -> gelu -> SE(rd .25) -> pw1x1, all bias-free, residual."""
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.Conv(c, (3, 3), feature_group_count=c, padding="SAME",
                    use_bias=False, name="conv_dw", **kw)(x)
        y = nn.gelu(y, approximate=False)
        s = y.mean(axis=(1, 2), keepdims=True)
        s = nn.gelu(nn.Conv(max(1, c // 4), (1, 1), use_bias=False,
                            name="se_reduce", **kw)(s), approximate=False)
        s = nn.sigmoid(nn.Conv(c, (1, 1), use_bias=False,
                               name="se_expand", **kw)(s))
        y = y * s
        y = nn.Conv(c, (1, 1), use_bias=False, name="conv_pw", **kw)(y)
        return x + y


class Downsample2d(nn.Module):
    """LN -> MbConv -> 3x3/2 conv (bias-free) -> LN."""
    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", **kw)(x)
        x = MbConv(name="conv_block", **kw)(x)
        x = nn.Conv(self.dim_out, (3, 3), strides=2, padding=1,
                    use_bias=False, name="reduction", **kw)(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm2", **kw)(x)


class GcAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    use_global: bool
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, global_q=None):
        b, hh, ww, c = x.shape
        h = self.num_heads
        hd = c // h
        ws = min(self.window_size, hh)
        t = _window_partition(x, ws)
        bnw, n, _ = t.shape
        if self.use_global:
            kv = nn.Dense(2 * c, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          kernel_init=nn.with_logical_partitioning(
                              trunc_init, ("embed", "qkv_out")),
                          name="qkv")(t)
            kv = kv.reshape(bnw, n, 2, h, hd).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            # shared global query: (B, n, c) -> broadcast over windows
            nw = bnw // b
            q = global_q.reshape(b, 1, n, h, hd)
            q = jnp.broadcast_to(q, (b, nw, n, h, hd)).reshape(
                bnw, n, h, hd).transpose(0, 2, 1, 3)
        else:
            qkv = nn.Dense(3 * c, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           kernel_init=nn.with_logical_partitioning(
                               trunc_init, ("embed", "qkv_out")),
                           name="qkv")(t)
            qkv = qkv.reshape(bnw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (hd ** -0.5)
        # per-block relative position bias (reference RelPosBias)
        table = self.param("rel_pos_bias_table", nn.initializers.zeros,
                           ((2 * ws - 1) ** 2, h), self.param_dtype)
        idx = _rel_pos_index(ws)
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c).astype(x.dtype)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                       kernel_init=nn.with_logical_partitioning(
                           trunc_init, ("qkv_out", "embed")),
                       name="proj")(out)
        return _window_merge(out, ws, hh, ww)


class GcVitBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    use_global: bool
    mlp_ratio: float = 3.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, global_q=None, deterministic: bool = True):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(x)
        y = GcAttention(c, self.num_heads, self.window_size,
                        self.use_global, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="attn")(y, global_q)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(x)
        y = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(y, deterministic)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(y, self.drop_path_rate, deterministic, rng)


class GCViT(nn.Module):
    embed_dim: int = 64
    depths: Sequence[int] = (3, 4, 19, 5)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    mlp_ratio: float = 3.0
    num_classes: int = 1000
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        # Stem: biased 3x3/2 conv then a same-width Downsample2d
        x = nn.Conv(self.embed_dim, (3, 3), strides=2, padding=1,
                    name="stem_conv1", **kw)(x)
        x = Downsample2d(self.embed_dim, name="stem_down", **kw)(x)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        for si, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** si)
            heads = self.num_heads[si]
            if si > 0:
                x = Downsample2d(dim, name=f"downsample_{si}", **kw)(x)
            ws = min(self.window_sizes[si], x.shape[1])
            # global query generator (FeatureBlock): max(1, log2(feat/ws))
            # MbConvs, max-pooling down while reductions remain
            g = x
            reductions = int(math.log2(max(g.shape[1] // ws, 1)))
            for gi in range(max(1, reductions)):
                g = MbConv(name=f"global_{si}_conv{gi}", **kw)(g)
                if gi < reductions:
                    g = nn.max_pool(g, (3, 3), strides=(2, 2),
                                    padding=((1, 1), (1, 1)))
            global_q = g.reshape(g.shape[0], ws * ws, dim)
            for blk in range(depth):
                use_global = blk % 2 == 1  # alternate local / global
                x = GcVitBlock(dim, heads, ws, use_global, self.mlp_ratio,
                               drop_path_rate=float(dpr[bi]),
                               name=f"stages_{si}_blocks_{blk}", **kw)(
                    x, global_q if use_global else None, deterministic)
                bi += 1
        # stage_norm on the last stage (channels-last, pre-pool)
        x = nn.LayerNorm(epsilon=1e-5, name="norm", **kw)(x)
        x = x.mean(axis=(1, 2))
        if self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="head",
                        **kw)(x).astype(jnp.float32)


def _gcvit(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return GCViT(**merged)

    return build


_VARIANTS = {
    "gcvit_xxtiny": dict(embed_dim=64, depths=(2, 2, 6, 2),
                         num_heads=(2, 4, 8, 16)),
    "gcvit_xtiny": dict(embed_dim=64, depths=(3, 4, 6, 5),
                        num_heads=(2, 4, 8, 16)),
    "gcvit_tiny": dict(embed_dim=64, depths=(3, 4, 19, 5),
                       num_heads=(2, 4, 8, 16)),
    "gcvit_small": dict(embed_dim=96, depths=(3, 4, 19, 5),
                        num_heads=(3, 6, 12, 24), mlp_ratio=2.0),
    "gcvit_base": dict(embed_dim=128, depths=(3, 4, 19, 5),
                       num_heads=(4, 8, 16, 32), mlp_ratio=2.0),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _gcvit(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"GCViT variant {_name!r} (reference gcvit.py registry "
                   f"surface).")
    setattr(_mod, _name, register_model(_fn))
