"""Flax building blocks for the ViT family.

Capability parity with the reference's vendored timm blocks
(reference models/vision_transformer.py:80-417): LayerScale, DropPath
(stochastic depth), PatchEmbed, Mlp, Attention, pre-norm Block, and the
MAP attention-pool head. Re-designed for TPU:

  * PatchEmbed is a reshape + one big matmul (B·196 × 768 × 768) instead of a
    strided conv — it lands directly on the MXU with no im2col.
  * All dense kernels carry flax *logical* partition names so the same model
    runs replicated (pure DP) or tensor-parallel over a 'model' mesh axis
    (qkv/fc1 column-parallel, proj/fc2 row-parallel) purely by changing the
    axis rules — no model code changes. The reference has no TP (SURVEY §2.3).
  * Softmax/statistics in fp32, matmuls in the policy compute dtype (bf16).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.ops.attention import multi_head_attention

Dtype = jnp.dtype

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


def _dense(features: int, names: Tuple[Optional[str], Optional[str]],
           use_bias: bool, dtype, param_dtype, name: str,
           kernel_init: Callable = trunc_init) -> nn.Dense:
    bias_axis = (names[1],) if names[1] else (None,)
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=nn.with_logical_partitioning(kernel_init, names),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), bias_axis),
        name=name,
    )


def _layer_norm(dtype, param_dtype, name: str, eps: float = 1e-6,
                norm_type: str = "layernorm"):
    if norm_type == "rmsnorm":
        return nn.RMSNorm(
            epsilon=eps, dtype=dtype, param_dtype=param_dtype,
            scale_init=nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("embed",)),
            name=name)
    return nn.LayerNorm(
        epsilon=eps,
        dtype=dtype,
        param_dtype=param_dtype,
        scale_init=nn.with_logical_partitioning(nn.initializers.ones_init(), ("embed",)),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), ("embed",)),
        name=name,
    )


def act_fn(name: str) -> Callable:
    """Activation by timm name (reference act_layer= strings)."""
    table = {
        # timm's GELU is torch nn.GELU = exact erf; "gelu_tanh" is the
        # tanh approximation (timm act string of the same name)
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "gelu_tanh": lambda x: nn.gelu(x, approximate=True),
        "gelu_exact": lambda x: nn.gelu(x, approximate=False),
        "quick_gelu": lambda x: x * nn.sigmoid(1.702 * x),
        "silu": nn.silu,
        "relu": nn.relu,
        "hard_swish": nn.hard_swish,
        "hard_sigmoid": nn.hard_sigmoid,
    }
    try:
        return table[name]
    except KeyError:
        raise ValueError(f"unknown act_layer {name!r}; known {sorted(table)}")


def drop_path(x: jax.Array, rate, deterministic: bool,
              rng: Optional[jax.Array]) -> jax.Array:
    """Stochastic depth (per-sample residual drop).

    Parity with reference models/vision_transformer.py DropPath usage in
    Block:109-178; scaling by 1/keep like timm's `drop_path(scale_by_keep=True)`.
    `rate` may be a traced scalar (per-layer rates under nn.scan).
    """
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    # keep==0: x/keep is inf but the all-false mask selects the zero branch
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class PatchEmbed(nn.Module):
    """Image -> patch tokens via reshape + matmul (MXU-friendly).

    Parity: reference models/vision_transformer.py:552-560 (Conv2d k16 s16).
    A stride-p conv over non-overlapping patches is exactly a reshape +
    (p*p*C, D) matmul; the reshape is free on TPU.
    """

    patch_size: int = 16
    embed_dim: int = 768
    use_bias: bool = True
    use_norm: bool = False        # norm after proj (timm embed_norm_layer,
    # reference vision_transformer.py:548-560 embed_args['norm_layer'] —
    # aimv2 towers normalize patch tokens inside the embed)
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        # cast BEFORE the patchify transpose: the transpose is HBM-bound and
        # bf16 halves its traffic (the matmul casts anyway)
        x = x.astype(self.dtype)
        if h != gh * p or w != gw * p:
            # non-divisible input (e.g. so400m patch14 at 384): match torch's
            # VALID strided conv, which floors — trailing rows/cols drop
            x = x[:, :gh * p, :gw * p]
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = _dense(self.embed_dim, ("patch", "embed"), self.use_bias,
                   self.dtype, self.param_dtype, "proj")(x)
        if self.use_norm:
            x = _layer_norm(self.dtype, self.param_dtype, "norm",
                            eps=self.norm_eps, norm_type=self.norm_type)(x)
        return x


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible params WITHOUT computing, for custom-VJP
    paths that need the raw W/b (same contract as _QkvParams, with
    configurable logical axes). Param names/shapes/inits match nn.Dense, so
    the tree is checkpoint-compatible with the plain Dense path."""

    features: int
    use_bias: bool
    axes: Tuple[Optional[str], Optional[str]]
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, d_in: int):
        w = self.param(
            "kernel",
            nn.with_logical_partitioning(trunc_init, self.axes),
            (d_in, self.features), self.param_dtype)
        b = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         (self.axes[1],)),
            (self.features,), self.param_dtype) if self.use_bias else None
        return w, b


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> act -> fc2 (col-/row-parallel over 'model').

    glu=True is timm's SwiGLUPacked (reference vision_transformer.py dinov2
    giant): fc1's output splits in two, silu(a) * b feeds fc2.

    use_pallas routes the plain tanh-gelu recipe through the fused-backward
    custom VJP (ops/mlp_fused.py::mlp_gelu: da never hits HBM, dgelu and the
    fc1-bias reduction fuse into the dy@W2ᵀ matmul pass); the param tree is
    identical so checkpoints interchange with the Dense path.
    """

    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    use_bias: bool = True
    act: str = "gelu"
    glu: bool = False
    use_norm: bool = False        # norm between act and fc2 (timm Mlp
    # norm_layer; reference Block scale_mlp_norm — beit3 remaps)
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # glu needs an even fc1 width to split into two gates
        hidden = self.hidden_dim // 2 * 2 if self.glu else self.hidden_dim
        # the fused kernel computes the tanh approximation internally —
        # only route acts with those semantics through it
        if (self.use_pallas and not self.glu and not self.use_norm
                and self.act == "gelu_tanh"
                and self.dropout == 0.0 and x.ndim == 3
                and x.shape[-1] % 128 == 0 and hidden % 128 == 0
                and self.out_dim % 128 == 0):
            from vision_transformers_torch_xla_tpu.ops.mlp_fused import mlp_gelu

            w1, b1 = _DenseParams(hidden, self.use_bias, ("embed", "mlp"),
                                  self.param_dtype, name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(self.out_dim, self.use_bias,
                                  ("mlp", "embed"), self.param_dtype,
                                  name="fc2")(hidden)
            return mlp_gelu(x.astype(self.dtype), w1, b1, w2, b2)
        x = self._dense_dot_db(hidden, ("embed", "mlp"), "fc1", x)
        if self.glu:
            a, b = jnp.split(x, 2, axis=-1)
            x = nn.silu(a) * b
        else:
            x = act_fn(self.act)(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        if self.use_norm:
            # timm Mlp: fc1 -> act -> drop1 -> norm -> fc2 -> drop2
            x = _layer_norm(self.dtype, self.param_dtype, "norm",
                            eps=self.norm_eps, norm_type=self.norm_type)(x)
        x = self._dense_dot_db(self.out_dim, ("mlp", "embed"), "fc2", x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x

    def _dense_dot_db(self, features, axes, name, x):
        """nn.Dense-equivalent (same param tree, same forward math) whose
        bias grad reduces via an MXU dot (ops/bias_grad.py) instead of the
        XLA loop-fusion reduce over dy."""
        from vision_transformers_torch_xla_tpu.ops.bias_grad import bias_add

        w, b = _DenseParams(features, self.use_bias, axes,
                            self.param_dtype, name=name)(x.shape[-1])
        x = jnp.einsum("...c,cd->...d", x.astype(self.dtype),
                       w.astype(self.dtype))
        return bias_add(x, b) if b is not None else x


class _QkvParams(nn.Module):
    """Declares the fused-qkv projection params WITHOUT computing: the
    fused projection+attention custom VJP (ops/flash_attention.py::
    qkv_proj_attention) needs the raw W/b. Param names, shapes, inits and
    logical axes match nn.Dense exactly, so the param tree is
    checkpoint-compatible with the plain Dense path."""

    features: int
    use_bias: bool
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, d_in: int):
        w = self.param(
            "kernel",
            nn.with_logical_partitioning(trunc_init, ("embed", "qkv_out")),
            (d_in, self.features), self.param_dtype)
        b = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(),
                                         ("qkv_out",)),
            (self.features,), self.param_dtype) if self.use_bias else None
        return w, b


class Attention(nn.Module):
    """Multi-head self-attention.

    Parity with timm's Attention as used by the reference ViT
    (reference models/vision_transformer.py:48-63 via _compat; SDPA fused path).
    qkv is a single fused projection; the core softmax-attention runs through
    ops.multi_head_attention (Pallas fused kernel on TPU, jnp elsewhere).
    """

    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    scale_norm: bool = False      # norm on the merged heads before proj
    # (timm Attention scale_norm; reference Block scale_attn_norm)
    proj_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        # the Pallas kernel has no dropout inside the softmax; an active
        # attn_drop routes through the jnp path (timm drops on the probs)
        attn_dropping = self.attn_drop > 0.0 and not deterministic
        pallas_ok = (self.use_pallas and not self.qk_norm
                     and not attn_dropping and hd % 64 == 0 and h % 2 == 0)
        from vision_transformers_torch_xla_tpu.ops.flash_attention import (
            _MAX_VMEM_SEQ,
        )

        if pallas_ok and s <= _MAX_VMEM_SEQ:
            # projection + head-pair attention under ONE custom VJP: the
            # backward kernel writes the whole dqkv cotangent as a single
            # pair-interleaved buffer (no per-block concatenate), and the
            # projection backward folds the column permutation into W
            # (ops/flash_attention.py::qkv_proj_attention). Param tree is
            # identical to the Dense path (qkv/kernel, qkv/bias).
            from vision_transformers_torch_xla_tpu.ops.flash_attention import (
                qkv_proj_attention,
            )

            w, b_ = _QkvParams(3 * d, self.qkv_bias, self.param_dtype,
                               name="qkv")(d)
            o = qkv_proj_attention(x, w, b_, h, scale=hd ** -0.5)
        elif pallas_ok:
            qkv = _dense(3 * d, ("embed", "qkv_out"), self.qkv_bias,
                         self.dtype, self.param_dtype, "qkv")(x)
            # long-sequence route: blocked flash kernel via the qkv-cols
            # entry point (ops/flash_attention.py::fused_attention_qkv_cols)
            from vision_transformers_torch_xla_tpu.ops.flash_attention import (
                fused_attention_qkv_cols,
            )

            o = fused_attention_qkv_cols(qkv, h, scale=hd ** -0.5)
        else:
            qkv = _dense(3 * d, ("embed", "qkv_out"), self.qkv_bias,
                         self.dtype, self.param_dtype, "qkv")(x)
            # head-major (B,H,S,hd) layout: the explicit transpose shows up
            # as copy ops (~11% of step) but XLA's batched dots are fastest
            # in this layout — measured 154 ms/step vs 170 ms for the
            # transpose-free (B,S,H,hd) einsum variant (ops.attention_bshd)
            # on v5e.
            qkv = qkv.reshape(b, s, 3, h, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if self.qk_norm:
                q = _layer_norm(self.dtype, self.param_dtype, "q_norm",
                                eps=self.norm_eps,
                                norm_type=self.norm_type)(q)
                k = _layer_norm(self.dtype, self.param_dtype, "k_norm",
                                eps=self.norm_eps,
                                norm_type=self.norm_type)(k)
            if attn_dropping:
                # dropout on the softmax probabilities (timm Attention
                # semantics, reference vision_transformer.py via _compat)
                s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
                p = jax.nn.softmax(s_ * hd ** -0.5, axis=-1)
                p = nn.Dropout(self.attn_drop)(p, deterministic=False)
                o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                               preferred_element_type=jnp.float32
                               ).astype(q.dtype)
            else:
                o = multi_head_attention(q, k, v, scale=hd ** -0.5,
                                         use_pallas=False)
            o = o.transpose(0, 2, 1, 3)
        o = o.reshape(b, s, d)
        if self.scale_norm:
            # timm Attention: norm on the merged heads before proj
            # (reference vision_transformer.py Block scale_attn_norm)
            o = _layer_norm(self.dtype, self.param_dtype, "norm",
                            eps=self.norm_eps, norm_type=self.norm_type)(o)
        if pallas_ok and s <= _MAX_VMEM_SEQ:
            # perf path: same math as nn.Dense, but the bias grad reduces
            # via an MXU dot (ops/bias_grad.py) — the XLA loop-fusion
            # reduce over dy ran at ~40% of HBM rate here. Param tree is
            # identical (proj/kernel, proj/bias).
            from vision_transformers_torch_xla_tpu.ops.bias_grad import (
                bias_add,
            )

            w_p, b_p = _DenseParams(d, self.proj_bias, ("qkv_out", "embed"),
                                    self.param_dtype, name="proj")(d)
            o = jnp.einsum("bsc,cd->bsd", o.astype(self.dtype),
                           w_p.astype(self.dtype))
            if b_p is not None:
                o = bias_add(o, b_p)
        else:
            o = _dense(d, ("qkv_out", "embed"), self.proj_bias, self.dtype,
                       self.param_dtype, "proj")(o)
        o = nn.Dropout(self.proj_drop)(o, deterministic=deterministic)
        return o


class LayerScale(nn.Module):
    """Per-channel learned residual scaling (reference vision_transformer.py:80-106)."""

    dim: int
    init_values: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma",
            nn.with_logical_partitioning(
                nn.initializers.constant(self.init_values), ("embed",)),
            (self.dim,), self.param_dtype)
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    """Pre-norm transformer block: x + DP(LS(attn(LN(x)))) + DP(LS(mlp(LN(x)))).

    Parity: reference models/vision_transformer.py:109-178.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    scale_attn_norm: bool = False  # norm before attn proj (beit3 remaps)
    scale_mlp_norm: bool = False   # norm between mlp act and fc2
    proj_bias: bool = True         # attn proj + mlp fc biases (timm
    # Block proj_bias; aimv2 towers disable it)
    init_values: Optional[float] = None
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    use_pallas: bool = False
    use_pallas_mlp: bool = False
    act: str = "gelu"
    glu: bool = False
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    mlp_hidden: Optional[int] = None  # overrides dim*mlp_ratio (channel
    # pruning, models/prune.py — reference models/_prune.py:116)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 drop_path_override=None) -> jax.Array:
        # drop_path_override: a (possibly traced) scalar rate — used by the
        # scan path to keep timm's linear 0->rate stochastic-depth schedule
        # with per-layer rates fed through nn.scan in_axes
        rate = self.drop_path_rate if drop_path_override is None \
            else drop_path_override
        rate_off = isinstance(rate, float) and rate == 0.0
        d = x.shape[-1]
        attn_out = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm, scale_norm=self.scale_attn_norm,
            proj_bias=self.proj_bias, attn_drop=self.attn_drop,
            proj_drop=self.proj_drop, norm_type=self.norm_type,
            norm_eps=self.norm_eps, use_pallas=self.use_pallas,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )(_layer_norm(self.dtype, self.param_dtype, "norm1",
                      eps=self.norm_eps, norm_type=self.norm_type)(x),
          deterministic)
        if self.init_values is not None:
            attn_out = LayerScale(d, self.init_values, self.param_dtype,
                                  name="ls1")(attn_out)
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        x = x + drop_path(attn_out, rate, deterministic, rng)

        mlp_out = Mlp(
            hidden_dim=self.mlp_hidden or int(d * self.mlp_ratio), out_dim=d,
            dropout=self.proj_drop, use_bias=self.proj_bias, act=self.act,
            glu=self.glu, use_norm=self.scale_mlp_norm,
            norm_type=self.norm_type, norm_eps=self.norm_eps,
            use_pallas=self.use_pallas_mlp,
            dtype=self.dtype,
            param_dtype=self.param_dtype, name="mlp",
        )(_layer_norm(self.dtype, self.param_dtype, "norm2",
                      eps=self.norm_eps, norm_type=self.norm_type)(x),
          deterministic)
        if self.init_values is not None:
            mlp_out = LayerScale(d, self.init_values, self.param_dtype,
                                 name="ls2")(mlp_out)
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        x = x + drop_path(mlp_out, rate, deterministic, rng)
        return x


class AttentionPoolLatent(nn.Module):
    """MAP head: one latent query cross-attends over all tokens.

    Parity with timm's AttentionPoolLatent used when global_pool='map'
    (reference models/vision_transformer.py:603-618).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        latent = self.param(
            "latent",
            nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
            (1, 1, d), self.param_dtype).astype(x.dtype)
        q = _dense(d, ("embed", "qkv_out"), True, self.dtype,
                   self.param_dtype, "q")(jnp.broadcast_to(latent, (b, 1, d)))
        kv = _dense(2 * d, ("embed", "qkv_out"), True, self.dtype,
                    self.param_dtype, "kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        o = multi_head_attention(q, k, v, scale=hd ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, 1, d)
        o = _dense(d, ("qkv_out", "embed"), True, self.dtype,
                   self.param_dtype, "proj")(o)
        o = o + Mlp(int(d * self.mlp_ratio), d, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="mlp")(
            _layer_norm(self.dtype, self.param_dtype, "norm",
                        eps=self.norm_eps)(o))
        return o[:, 0]


class ResPostBlock(nn.Module):
    """Residual-post-norm block: x + DP(LN(attn(x))), x + DP(LN(mlp(x))).

    Parity: reference models/vision_transformer.py:181-239 (ResPostBlock;
    init_values scales the post-norms' weight init instead of LayerScale).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    use_pallas: bool = False
    use_pallas_mlp: bool = False
    act: str = "gelu"
    glu: bool = False
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _norm(self, name):
        scale = nn.initializers.constant(self.init_values) \
            if self.init_values is not None else nn.initializers.ones_init()
        return nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype,
            scale_init=nn.with_logical_partitioning(scale, ("embed",)),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("embed",)),
            name=name)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 drop_path_override=None) -> jax.Array:
        rate = self.drop_path_rate if drop_path_override is None \
            else drop_path_override
        rate_off = isinstance(rate, float) and rate == 0.0
        d = x.shape[-1]
        y = Attention(num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                      qk_norm=self.qk_norm, attn_drop=self.attn_drop,
                      proj_drop=self.proj_drop, use_pallas=self.use_pallas,
                      dtype=self.dtype, param_dtype=self.param_dtype,
                      name="attn")(x, deterministic)
        y = self._norm("norm1")(y)
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        x = x + drop_path(y, rate, deterministic, rng)

        y = Mlp(hidden_dim=int(d * self.mlp_ratio), out_dim=d,
                dropout=self.proj_drop, act=self.act, glu=self.glu,
                use_pallas=self.use_pallas_mlp, dtype=self.dtype,
                param_dtype=self.param_dtype, name="mlp")(x, deterministic)
        y = self._norm("norm2")(y)
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        return x + drop_path(y, rate, deterministic, rng)


class ParallelScalingBlock(nn.Module):
    """ViT-22B-style parallel block: one fused in-projection computes qkv AND
    the MLP hidden in a single matmul; attention and MLP branches are summed
    into the residual. Parity: reference vision_transformer.py:242-341.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = True          # ViT-22B normalizes q and k
    init_values: Optional[float] = None
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    use_pallas: bool = False
    use_pallas_mlp: bool = False  # accepted for block_kwargs parity; the
    # fused in-projection precludes the standalone MLP custom VJP
    act: str = "gelu"
    glu: bool = False             # accepted for block_kwargs parity; unused
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 drop_path_override=None) -> jax.Array:
        rate = self.drop_path_rate if drop_path_override is None \
            else drop_path_override
        rate_off = isinstance(rate, float) and rate == 0.0
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        mlp_hidden = int(d * self.mlp_ratio)

        y = _layer_norm(self.dtype, self.param_dtype, "in_norm",
                        eps=self.norm_eps, norm_type=self.norm_type)(x)
        fused = _dense(3 * d + mlp_hidden, ("embed", "qkv_out"),
                       self.qkv_bias, self.dtype, self.param_dtype,
                       "in_proj")(y)
        qkv, mlp_h = fused[..., :3 * d], fused[..., 3 * d:]
        qkv = qkv.reshape(b, s, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.qk_norm:
            q = _layer_norm(self.dtype, self.param_dtype, "q_norm",
                            eps=self.norm_eps, norm_type=self.norm_type)(q)
            k = _layer_norm(self.dtype, self.param_dtype, "k_norm",
                            eps=self.norm_eps, norm_type=self.norm_type)(k)
        o = multi_head_attention(q, k, v, scale=hd ** -0.5, use_pallas=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        attn_out = _dense(d, ("qkv_out", "embed"), True, self.dtype,
                          self.param_dtype, "attn_out_proj")(o)

        mlp_out = _dense(d, ("mlp", "embed"), True, self.dtype,
                         self.param_dtype, "mlp_out_proj")(
            act_fn(self.act)(mlp_h))

        y = attn_out + mlp_out
        if self.init_values is not None:
            y = LayerScale(d, self.init_values, self.param_dtype, name="ls")(y)
        rng = None if deterministic or rate_off else self.make_rng("droppath")
        return x + drop_path(y, rate, deterministic, rng)


class ParallelThingsBlock(nn.Module):
    """'Three things everyone should know about ViTs' parallel block:
    x = x + sum_i attn_i(LN_i(x)); x = x + sum_i mlp_i(LN_i(x)).
    Parity: reference vision_transformer.py:344-416 (num_parallel=2).
    """

    num_heads: int
    num_parallel: int = 2
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    init_values: Optional[float] = None
    drop_path_rate: float = 0.0
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    use_pallas: bool = False
    use_pallas_mlp: bool = False
    act: str = "gelu"
    glu: bool = False
    norm_type: str = "layernorm"
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 drop_path_override=None) -> jax.Array:
        rate = self.drop_path_rate if drop_path_override is None \
            else drop_path_override
        rate_off = isinstance(rate, float) and rate == 0.0
        d = x.shape[-1]

        def residual(y):
            rng = None if deterministic or rate_off else \
                self.make_rng("droppath")
            return drop_path(y, rate, deterministic, rng)

        attn_sum = 0.0
        for i in range(self.num_parallel):
            y = Attention(num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                          qk_norm=self.qk_norm, attn_drop=self.attn_drop,
                          proj_drop=self.proj_drop, use_pallas=self.use_pallas,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name=f"attns_{i}")(
                _layer_norm(self.dtype, self.param_dtype,
                            f"attn_norms_{i}", eps=self.norm_eps,
                            norm_type=self.norm_type)(x), deterministic)
            if self.init_values is not None:
                y = LayerScale(d, self.init_values, self.param_dtype,
                               name=f"attn_ls_{i}")(y)
            attn_sum = attn_sum + residual(y)
        x = x + attn_sum

        mlp_sum = 0.0
        for i in range(self.num_parallel):
            y = Mlp(hidden_dim=int(d * self.mlp_ratio), out_dim=d,
                    dropout=self.proj_drop, act=self.act, glu=self.glu,
                    use_pallas=self.use_pallas_mlp, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"mlps_{i}")(
                _layer_norm(self.dtype, self.param_dtype,
                            f"mlp_norms_{i}", eps=self.norm_eps,
                            norm_type=self.norm_type)(x), deterministic)
            if self.init_values is not None:
                y = LayerScale(d, self.init_values, self.param_dtype,
                               name=f"mlp_ls_{i}")(y)
            mlp_sum = mlp_sum + residual(y)
        return x + mlp_sum


BLOCK_TYPES = {
    "block": Block,
    "respost": ResPostBlock,
    "parallel_scaling": ParallelScalingBlock,
    "parallel_things": ParallelThingsBlock,
}
