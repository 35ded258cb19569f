"""Flax VisionTransformer.

Capability parity with the reference's vendored timm ViT
(reference models/vision_transformer.py:444-995): patch embed, cls/reg
tokens, learned position embedding, pre-norm blocks with LayerScale and
stochastic depth, avg/token/map pooling, fc_norm, classifier head, and
gradient checkpointing (`set_grad_checkpointing` :686 -> here `remat=True`
wraps each block in `jax.checkpoint`). Dynamic-size pos-embed resampling
(reference :743-780) is provided by `resample_pos_embed` below.

TPU-first design notes: NHWC inputs, patch embedding as one matmul,
parameters annotated with logical axes for DP/TP/FSDP via mesh rules,
fp32 params + bf16 compute via the dtype policy.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import (
    BLOCK_TYPES,
    AttentionPoolLatent,
    Block,
    PatchEmbed,
    _layer_norm,
    trunc_init,
)


def resample_pos_embed(pos_embed: jax.Array, new_grid: tuple,
                       old_grid: tuple, num_prefix_tokens: int = 1) -> jax.Array:
    """Bicubic-resample a learned (1, P+N, D) pos-embed to a new grid size.

    Parity with reference models/vision_transformer.py:748-756 /
    resize_pos_embed :1066.
    """
    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    d = grid.shape[-1]
    grid = grid.reshape(1, old_grid[0], old_grid[1], d)
    grid = jax.image.resize(grid, (1, new_grid[0], new_grid[1], d), method="cubic")
    grid = grid.reshape(1, new_grid[0] * new_grid[1], d)
    return jnp.concatenate([prefix, grid], axis=1)


class _ScanBody(nn.Module):
    """lax.scan body: one transformer block returning (carry, None).

    `dp_rate` is this layer's stochastic-depth rate, scanned over a
    length-`depth` array (in_axes=0) so scan mode keeps timm's linear
    0->rate schedule exactly (reference vision_transformer.py:582-600 dpr).
    """

    block_kwargs: tuple  # dict items, kept hashable for the module dataclass

    @nn.compact
    def __call__(self, x, dp_rate, deterministic):
        kw = dict(self.block_kwargs)
        block_cls = Block
        if kw.pop("remat", False):
            block_cls = nn.remat(Block, static_argnums=(2,),
                                 policy=jax.checkpoint_policies.nothing_saveable)
        self.sow("intermediates", "dp_rate", dp_rate)
        # positional so nn.remat's static_argnums=(2,) still marks
        # `deterministic`; dp_rate (index 3) stays traced
        return block_cls(**kw, name="block")(x, deterministic, dp_rate), None


class VisionTransformer(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_norm: bool = False
    scale_attn_norm: bool = False              # norm before attn proj
    scale_mlp_norm: bool = False               # norm between mlp act and fc2
    # (reference vision_transformer.py Block scale_attn/mlp_norm — beit3)
    proj_bias: bool = True                     # attn proj + mlp biases
    init_values: Optional[float] = None       # LayerScale init; None disables
    class_token: bool = True
    reg_tokens: int = 0
    global_pool: str = "token"                 # '' | 'avg' | 'avgmax' |
    # 'max' | 'token' | 'map' (timm default 'token'; reference :459)
    pool_include_prefix: bool = False          # pool over prefix tokens too
    # (reference :477 pool_include_prefix; default strips cls/reg first)
    fc_norm: Optional[bool] = None             # default: global_pool in
    # ('avg','avgmax','max'); when active the trunk-final norm is SKIPPED —
    # norm and fc_norm are mutually exclusive (reference :564-618)
    drop_rate: float = 0.0
    pos_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0                # linearly scaled over depth
    pre_norm: bool = False
    no_embed_class: bool = False               # pos_embed covers patch tokens
    # only; prefix tokens concat after the add (reference :743-780)
    act_layer: str = "gelu"                    # 'gelu' | 'gelu_tanh' |
    # 'quick_gelu' (CLIP) | 'silu' — timm act_layer strings
    swiglu_mlp: bool = False                   # SwiGLUPacked MLP (dinov2 giant)
    norm_type: str = "layernorm"               # 'layernorm' | 'rmsnorm' (xp)
    norm_eps: float = 1e-6                     # per-variant norm eps —
    # CLIP/quickgelu/beit3 towers use 1e-5 (reference entrypoints pass
    # norm_layer=partial(LayerNorm, eps=1e-5))
    embed_norm: bool = False                   # norm inside the patch embed
    # (reference embed_norm_layer — aimv2 towers)
    final_norm: bool = True                    # apply the trunk-final norm
    # (intern300m sets final_norm=False, reference vision_transformer.py)
    block_type: str = "block"                  # 'block' | 'respost' |
    # 'parallel_scaling' | 'parallel_things' (reference
    # vision_transformer.py:181,242,344 alternative block classes)
    patch_drop_rate: float = 0.0               # PatchDropout (reference
    # :572-578): drop a random fraction of patch tokens during training
    dynamic_img_size: bool = False             # accept any input size by
    # resampling pos_embed at trace time (reference :748-756)
    pos_grid: Optional[int] = None             # grid the pos_embed param is
    # sized for; defaults to img_size//patch_size. set_input_size pins it to
    # the original grid so existing params stay loadable.
    mlp_hidden: Optional[tuple] = None         # per-block MLP widths from
    # channel pruning (models/prune.py; reference models/_prune.py:116).
    # Loop mode only — scan stacks layers and needs uniform shapes.
    use_pallas_attn: bool = False
    use_pallas_mlp: bool = False               # fused-backward MLP custom
    # VJP (ops/mlp_fused.py) — same param tree as the Dense path
    remat: bool = False                        # gradient checkpointing
    remat_policy: str = "nothing"              # 'nothing' | 'dots' — what the
    # checkpointed blocks may keep ('dots' saves matmul outputs, recomputing
    # only elementwise ops in the backward pass)
    scan_blocks: bool = False                  # lax.scan over layers: one
    # compiled block instead of `depth` (compile time ~depth x lower; params
    # stacked on a leading layer axis). Per-layer DropPath rates ride the
    # scan via in_axes, so the linear 0->rate schedule matches loop mode.
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.reg_tokens

    def set_input_size(self, img_size: int) -> "VisionTransformer":
        """New module configured for a different input size; existing params
        stay loadable (pos_embed resamples at trace time). Parity with
        reference vision_transformer.py:718 set_input_size."""
        return self.clone(img_size=img_size, dynamic_img_size=True,
                          pos_grid=self.pos_grid or
                          self.img_size // self.patch_size)

    def _patch_dropout(self, x: jax.Array) -> jax.Array:
        """PatchDropout (reference :572-578): keep prefix tokens, keep a
        random subset of patch tokens (static count -> jit-stable shapes)."""
        npt = self.num_prefix_tokens
        prefix, patches = x[:, :npt], x[:, npt:]
        b, n, _ = patches.shape
        keep = max(1, int(n * (1.0 - self.patch_drop_rate)))
        rng = self.make_rng("dropout")
        scores = jax.random.uniform(rng, (b, n))
        idx = jnp.argsort(scores, axis=-1)[:, :keep]
        kept = jnp.take_along_axis(patches, idx[..., None], axis=1)
        return jnp.concatenate([prefix, kept], axis=1) if npt else kept

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = self.forward_features(x, deterministic)
        return self.forward_head(x, deterministic)

    def forward_features(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        """Parity: reference vision_transformer.py:934-951."""
        b = x.shape[0]
        x = PatchEmbed(self.patch_size, self.embed_dim,
                       # CLIP towers drop the embed bias under pre-norm
                       # (reference :557 bias=not pre_norm)
                       use_bias=not self.pre_norm,
                       use_norm=self.embed_norm, norm_type=self.norm_type,
                       norm_eps=self.norm_eps, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="patch_embed")(x)
        n_patches = x.shape[1]

        prefix = []
        if self.class_token:
            cls = self.param(
                "cls_token",
                nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                (1, 1, self.embed_dim), self.param_dtype)
            prefix.append(jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim)))
        if self.reg_tokens:
            reg = self.param(
                "reg_token",
                nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
                (1, self.reg_tokens, self.embed_dim), self.param_dtype)
            prefix.append(jnp.broadcast_to(reg.astype(x.dtype),
                                           (b, self.reg_tokens, self.embed_dim)))
        # pos_embed is sized for the CONFIGURED grid; with dynamic_img_size a
        # different input grid resamples it at trace time (shapes stay static
        # under jit — reference vision_transformer.py:748-756 runtime path).
        # no_embed_class: pos covers patch tokens only, prefix concats after
        # the add (reference :743-780).
        cfg_grid = self.pos_grid or self.img_size // self.patch_size
        pos_prefix = 0 if self.no_embed_class else self.num_prefix_tokens
        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
            (1, cfg_grid * cfg_grid + pos_prefix, self.embed_dim),
            self.param_dtype)
        if n_patches != cfg_grid * cfg_grid:
            if not self.dynamic_img_size:
                raise ValueError(
                    f"input grid {n_patches} patches != configured "
                    f"{cfg_grid * cfg_grid}; set dynamic_img_size=True or "
                    f"img_size to match")
            new_side = int(n_patches ** 0.5)
            pos = resample_pos_embed(pos, (new_side, new_side),
                                     (cfg_grid, cfg_grid), pos_prefix)
        if self.no_embed_class:
            x = x + pos.astype(x.dtype)
            if prefix:
                x = jnp.concatenate(prefix + [x], axis=1)
        else:
            if prefix:
                x = jnp.concatenate(prefix + [x], axis=1)
            x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.pos_drop_rate)(x, deterministic=deterministic)
        if self.patch_drop_rate > 0 and not deterministic:
            x = self._patch_dropout(x)
        if self.pre_norm:
            x = _layer_norm(self.dtype, self.param_dtype, "norm_pre",
                            eps=self.norm_eps, norm_type=self.norm_type)(x)

        block_cls = BLOCK_TYPES[self.block_type]
        if self.remat:
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if self.remat_policy == "dots"
                      else jax.checkpoint_policies.nothing_saveable)
            block_cls = nn.remat(block_cls, static_argnums=(2,), policy=policy)
        block_kwargs = dict(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_norm=self.qk_norm,
            init_values=self.init_values,
            proj_drop=self.proj_drop_rate, attn_drop=self.attn_drop_rate,
            use_pallas=self.use_pallas_attn,
            use_pallas_mlp=self.use_pallas_mlp, act=self.act_layer,
            glu=self.swiglu_mlp, norm_type=self.norm_type,
            norm_eps=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype)  # shared by loop + scan paths
        if self.block_type == "block":
            # only the standard Block carries the beit3/aimv2 extras; the
            # alternative block classes keep their reference signatures
            block_kwargs.update(scale_attn_norm=self.scale_attn_norm,
                                scale_mlp_norm=self.scale_mlp_norm,
                                proj_bias=self.proj_bias)
        if self.mlp_hidden is not None and (self.scan_blocks or
                                            self.block_type != "block"):
            raise ValueError("mlp_hidden (pruned per-block widths) requires "
                             "loop mode with block_type='block'")
        if self.scan_blocks:
            scanned = nn.scan(
                _ScanBody,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True, "droppath": True},
                in_axes=(0, nn.broadcast),
                length=self.depth,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(block_kwargs=tuple(
                dict(remat=self.remat, **block_kwargs).items()),
              name="blocks_stacked")
            # per-layer linear 0->rate schedule, identical to the loop path
            dp_rates = self.drop_path_rate * jnp.arange(
                self.depth, dtype=jnp.float32) / max(self.depth - 1, 1)
            x, _ = scanned(x, dp_rates, deterministic)
        else:
            for i in range(self.depth):
                dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
                # activation sharding hint: no-op without logical rules; with
                # SP rules ('seq'->'model') tokens shard across the mesh and
                # GSPMD inserts attention's all-gathers
                x = nn.with_logical_constraint(x, ("batch", "seq_act", "embed"))
                extra = {}
                if self.mlp_hidden is not None:
                    extra["mlp_hidden"] = int(self.mlp_hidden[i])
                x = block_cls(drop_path_rate=dpr, **block_kwargs, **extra,
                              name=f"blocks_{i}")(x, deterministic)
                # feature taps (parity: forward_intermediates, reference
                # vision_transformer.py:782-875): free unless the caller
                # applies with mutable=["intermediates"]
                self.sow("intermediates", f"block_{i}", x)
        if self.final_norm and not self._use_fc_norm:
            # trunk norm and post-pool fc_norm are mutually exclusive
            # (reference :602/:618: whichever use_fc_norm selects, the
            # other is nn.Identity)
            x = _layer_norm(self.dtype, self.param_dtype, "norm",
                            eps=self.norm_eps, norm_type=self.norm_type)(x)
        return x

    @property
    def _use_fc_norm(self) -> bool:
        return self.fc_norm if self.fc_norm is not None else \
            self.global_pool in ("avg", "avgmax", "max")

    def forward_head(self, x: jax.Array, deterministic: bool = True,
                     pre_logits: bool = False) -> jax.Array:
        """Pool + fc_norm + head. Parity: reference vision_transformer.py:953-990."""
        npt = 0 if self.pool_include_prefix else self.num_prefix_tokens
        if self.global_pool == "token":
            pooled = x[:, 0]
        elif self.global_pool in ("avg", "avgmax", "max"):
            # reference global_pool_nlc (:419-441): strip prefix tokens
            # unless pool_include_prefix, then reduce
            tokens = x[:, npt:]
            if self.global_pool == "avg":
                pooled = jnp.mean(tokens, axis=1)
            elif self.global_pool == "max":
                pooled = jnp.max(tokens, axis=1)
            else:
                pooled = 0.5 * (jnp.max(tokens, axis=1)
                                + jnp.mean(tokens, axis=1))
        elif self.global_pool == "map":
            pooled = AttentionPoolLatent(self.num_heads, self.mlp_ratio,
                                         norm_eps=self.norm_eps,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="attn_pool")(x[:, npt:])
        else:
            pooled = x  # no pooling: return token features

        if self.final_norm and self._use_fc_norm:
            pooled = _layer_norm(self.dtype, self.param_dtype, "fc_norm",
                                 eps=self.norm_eps,
                                 norm_type=self.norm_type)(pooled)
        pooled = nn.Dropout(self.drop_rate)(pooled, deterministic=deterministic)
        if pre_logits or self.num_classes == 0:
            return pooled
        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(trunc_init, ("embed", "classes")),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("classes",)),
            name="head")(pooled)
        return logits.astype(jnp.float32)


# Param name fragments excluded from weight decay — parity with
# reference vision_transformer.py:666 (no_weight_decay = {pos_embed, cls_token,
# dist_token}) plus the usual 1-D param rule (optim_factory.py:104-113).
NO_WEIGHT_DECAY_KEYWORDS = ("pos_embed", "cls_token", "reg_token", "latent",
                            "dist_token", "gamma", "bias", "scale")
