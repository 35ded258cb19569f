"""EfficientFormer v1/v2 in Flax, NHWC.

Parity with the reference's dormant efficientformer.py (649 LoC) and
efficientformer_v2.py (804 LoC) — SURVEY §2.2:

* v1: conv stem, three conv stages of pool-mixer blocks with conv-BN
  MLPs (all-4D), and a final stage that switches to token-space
  transformer blocks (LN + attention with LeViT-style learned position
  biases) for the last `vit_num` blocks.
* v2: the conv-MLP gains a mid depthwise 3x3 (local mixing), and the
  last two stages interleave attention blocks with talking-heads
  projections across heads on the attention logits.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import drop_path
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.levit import _bias_index

__all__ = []


class _ConvMlpBlock(nn.Module):
    """4D block: pool mixer + conv-BN MLP (v2 adds a mid dw conv)."""
    dim: int
    mlp_ratio: float = 4.0
    mid_dw: bool = False
    layer_scale: float = 1e-5
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.dim
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        conv = partial(nn.Conv, padding="SAME", use_bias=False,
                       dtype=self.dtype, param_dtype=self.param_dtype)

        def scaled(y, name):
            g = self.param(name, nn.initializers.constant(self.layer_scale),
                           (c,), self.param_dtype)
            return y * g.astype(y.dtype)

        y = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME") - x
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        x = x + drop_path(scaled(y, "ls1"), self.drop_path_rate,
                          deterministic, rng)

        mid = int(c * self.mlp_ratio)
        y = nn.gelu(bn(name="mlp_bn1")(conv(mid, (1, 1),
                                            name="mlp_fc1")(x)))
        if self.mid_dw:
            y = nn.gelu(bn(name="mlp_bn_dw")(conv(
                mid, (3, 3), feature_group_count=mid, name="mlp_dw")(y)))
        y = bn(name="mlp_bn2")(conv(c, (1, 1), name="mlp_fc2")(y))
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        return x + drop_path(scaled(y, "ls2"), self.drop_path_rate,
                             deterministic, rng)


class _AttnBlock(nn.Module):
    """3D block: LN + biased attention (+ talking heads for v2) + MLP."""
    dim: int
    num_heads: int = 8
    key_dim: int = 32
    attn_ratio: float = 4.0
    talking_heads: bool = False
    mlp_ratio: float = 4.0
    layer_scale: float = 1e-5
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, hh, ww, c = x.shape
        n = hh * ww
        h, kd = self.num_heads, self.key_dim
        vd = int(self.attn_ratio * kd)

        def scaled(y, name):
            g = self.param(name, nn.initializers.constant(self.layer_scale),
                           (c,), self.param_dtype)
            return y * g.astype(y.dtype)

        t = x.reshape(b, n, c)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm1")(t)
        qkv = nn.Dense(h * (2 * kd + vd), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, h, 2 * kd + vd),
                            [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (kd ** -0.5)
        table = self.param("attention_biases", nn.initializers.zeros,
                           (h, hh * ww), self.param_dtype)
        idx = _bias_index(hh)
        attn = attn + table[:, idx.reshape(-1)].reshape(
            h, n, n)[None].astype(attn.dtype)
        if self.talking_heads:
            attn = jnp.einsum("bhqk,hg->bgqk", attn, self.param(
                "talk_pre", nn.initializers.orthogonal(), (h, h),
                self.param_dtype).astype(attn.dtype))
        attn = jax.nn.softmax(attn, axis=-1)
        if self.talking_heads:
            attn = jnp.einsum("bhqk,hg->bgqk", attn, self.param(
                "talk_post", nn.initializers.orthogonal(), (h, h),
                self.param_dtype).astype(attn.dtype))
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, n, h * vd).astype(x.dtype)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj")(out)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        t = t + drop_path(scaled(y, "ls1"), self.drop_path_rate,
                          deterministic, rng)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm2")(t)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="mlp_fc2")(y)
        rng = None if deterministic or self.drop_path_rate == 0 else \
            self.make_rng("droppath")
        t = t + drop_path(scaled(y, "ls2"), self.drop_path_rate,
                          deterministic, rng)
        return t.reshape(b, hh, ww, c)


class EfficientFormer(nn.Module):
    embed_dims: Sequence[int] = (48, 96, 224, 448)
    depths: Sequence[int] = (3, 2, 6, 4)
    vit_num: int = 1  # trailing attention blocks in the final stage
    v2: bool = False  # mid-dw MLPs + attention in last two stages
    num_classes: int = 1000
    # the reference constructs head_dist unconditionally
    # (efficientformer.py:419); published counts include it
    distillation: bool = True
    drop_path_rate: float = 0.0
    img_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = partial(nn.BatchNorm, use_running_average=deterministic,
                     momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                     param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        c0 = self.embed_dims[0]
        x = nn.gelu(bn(name="stem_bn1")(nn.Conv(
            c0 // 2, (3, 3), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="stem_conv1")(x)))
        x = nn.gelu(bn(name="stem_bn2")(nn.Conv(
            c0, (3, 3), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="stem_conv2")(x)))

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        bi = 0
        n_stages = len(self.depths)
        for si, (dim, depth) in enumerate(zip(self.embed_dims, self.depths)):
            if si > 0:
                x = bn(name=f"downsample_bn_{si}")(nn.Conv(
                    dim, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"downsample_{si}")(x))
            for blk in range(depth):
                name = f"stages_{si}_blocks_{blk}"
                attn_here = (
                    si == n_stages - 1 and blk >= depth - self.vit_num) or (
                    self.v2 and si == n_stages - 2 and blk >= depth - 1)
                if attn_here:
                    x = _AttnBlock(dim, talking_heads=self.v2,
                                   drop_path_rate=float(dpr[bi]),
                                   dtype=self.dtype,
                                   param_dtype=self.param_dtype,
                                   name=name)(x, deterministic)
                else:
                    x = _ConvMlpBlock(dim, mid_dw=self.v2,
                                      drop_path_rate=float(dpr[bi]),
                                      dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name=name)(x, deterministic)
                bi += 1
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(x)
        if self.num_classes == 0:
            return x
        head = nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="head")(x)
        if self.distillation:
            head_d = nn.Dense(self.num_classes, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="head_dist")(x)
            head = (head + head_d) / 2
        return head.astype(jnp.float32)


def _ef(cfg):
    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items() if v is not None})
        return EfficientFormer(**merged)

    return build


_VARIANTS = {
    "efficientformer_l1": dict(embed_dims=(48, 96, 224, 448),
                               depths=(3, 2, 6, 4), vit_num=1),
    "efficientformer_l3": dict(embed_dims=(64, 128, 320, 512),
                               depths=(4, 4, 12, 6), vit_num=4),
    "efficientformer_l7": dict(embed_dims=(96, 192, 384, 768),
                               depths=(6, 6, 18, 8), vit_num=8),
    # efficientformerv2_* live in efficientformer_v2.py (dedicated
    # Attention2d implementation with rel-pos biases + talking heads)
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _cfg in _VARIANTS.items():
    _fn = _ef(_cfg)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"EfficientFormer variant {_name!r} (reference "
                   f"efficientformer[_v2].py registry surface).")
    setattr(_mod, _name, register_model(_fn))
