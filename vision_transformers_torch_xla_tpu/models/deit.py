"""DeiT: ViT with a distillation token.

Parity with the reference's dormant deit.py (417 LoC, incl.
`VisionTransformerDistilled` with its distillation token, reference
models/deit.py:28). The distilled variant adds a second prefix token whose
head is trained against the teacher (pairs with the trainer's KD loss,
reference main.py:939-970); at eval the two head outputs are averaged.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.layers import _layer_norm, trunc_init
from vision_transformers_torch_xla_tpu.models.registry import register_model
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer

__all__ = []


class VisionTransformerDistilled(VisionTransformer):
    """ViT + dist_token; returns (cls_logits + dist_logits) / 2 at eval and
    concatenated token logits pair in train mode when `return_both=True`."""

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True,
                 return_both: bool = False) -> jax.Array:
        b = x.shape[0]
        from vision_transformers_torch_xla_tpu.models.layers import Block, PatchEmbed

        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="patch_embed")(x)
        n_patches = x.shape[1]
        cls = self.param("cls_token",
                         nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                         (1, 1, self.embed_dim), self.param_dtype)
        dist = self.param("dist_token",
                          nn.with_logical_partitioning(trunc_init, (None, None, "embed")),
                          (1, 1, self.embed_dim), self.param_dtype)
        x = jnp.concatenate([
            jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.embed_dim)),
            jnp.broadcast_to(dist.astype(x.dtype), (b, 1, self.embed_dim)),
            x], axis=1)
        pos = self.param("pos_embed",
                         nn.with_logical_partitioning(trunc_init, (None, "seq", "embed")),
                         (1, n_patches + 2, self.embed_dim), self.param_dtype)
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.pos_drop_rate)(x, deterministic=deterministic)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=self.qkv_bias, init_values=self.init_values,
                      drop_path_rate=dpr, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name=f"blocks_{i}")(x, deterministic)
        x = _layer_norm(self.dtype, self.param_dtype, "norm")(x)

        head = nn.Dense(self.num_classes, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        kernel_init=nn.with_logical_partitioning(
                            trunc_init, ("embed", "classes")),
                        name="head")
        head_dist = nn.Dense(self.num_classes, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             kernel_init=nn.with_logical_partitioning(
                                 trunc_init, ("embed", "classes")),
                             name="head_dist")
        logits = head(x[:, 0]).astype(jnp.float32)
        logits_dist = head_dist(x[:, 1]).astype(jnp.float32)
        if return_both:
            return logits, logits_dist
        return (logits + logits_dist) / 2.0


def _deit(distilled, _patch, _dim, _depth, _heads, **kw):
    kw.pop("pretrained_tag", None)
    cls = VisionTransformerDistilled if distilled else VisionTransformer
    if not distilled:
        kw.setdefault("global_pool", "token")
        kw.setdefault("fc_norm", False)
    kw.setdefault("img_size", 224)
    kw.setdefault("patch_size", _patch)
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("num_heads", _heads)
    return cls(**kw)


@register_model
def deit_tiny_patch16_224(**kw):
    return _deit(False, 16, 192, 12, 3, **kw)


@register_model
def deit_small_patch16_224(**kw):
    return _deit(False, 16, 384, 12, 6, **kw)


@register_model
def deit_base_patch16_224(**kw):
    return _deit(False, 16, 768, 12, 12, **kw)


@register_model
def deit_tiny_distilled_patch16_224(**kw):
    return _deit(True, 16, 192, 12, 3, **kw)


@register_model
def deit_small_distilled_patch16_224(**kw):
    return _deit(True, 16, 384, 12, 6, **kw)


@register_model
def deit_base_distilled_patch16_224(**kw):
    return _deit(True, 16, 768, 12, 12, **kw)


@register_model
def deit_base_patch16_384(**kw):
    kw.setdefault("img_size", 384)
    return _deit(False, 16, 768, 12, 12, **kw)


@register_model
def deit_base_distilled_patch16_384(**kw):
    kw.setdefault("img_size", 384)
    return _deit(True, 16, 768, 12, 12, **kw)


# DeiT-3 (reference deit.py deit3_* registrations): plain ViT trunk with
# LayerScale 1e-6 and no_embed_class (pos embed covers patch tokens only)
def _deit3(_patch, _dim, _depth, _heads, **kw):
    kw.pop("pretrained_tag", None)
    if kw.get("init_values") is None:
        kw.pop("init_values", None)
    kw.setdefault("init_values", 1e-6)
    kw.setdefault("no_embed_class", True)
    kw.setdefault("global_pool", "token")
    kw.setdefault("fc_norm", False)
    kw.setdefault("patch_size", _patch)
    kw.setdefault("embed_dim", _dim)
    kw.setdefault("depth", _depth)
    kw.setdefault("num_heads", _heads)
    return VisionTransformer(**kw)


_DEIT3 = {
    "deit3_small_patch16_224": (16, 384, 12, 6, 224),
    "deit3_small_patch16_384": (16, 384, 12, 6, 384),
    "deit3_medium_patch16_224": (16, 512, 12, 8, 224),
    "deit3_base_patch16_224": (16, 768, 12, 12, 224),
    "deit3_base_patch16_384": (16, 768, 12, 12, 384),
    "deit3_large_patch16_224": (16, 1024, 24, 16, 224),
    "deit3_large_patch16_384": (16, 1024, 24, 16, 384),
    "deit3_huge_patch14_224": (14, 1280, 32, 16, 224),
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, (_p, _d, _dep, _h, _res) in _DEIT3.items():
    def _build(_p=_p, _d=_d, _dep=_dep, _h=_h, _res=_res, **kw):
        kw.setdefault("img_size", _res)
        return _deit3(_p, _d, _dep, _h, **kw)
    _build.__name__ = _name
    _build.__qualname__ = _name
    _build.__doc__ = (f"DeiT-3 variant {_name!r} (reference deit.py "
                      f"registry surface).")
    setattr(_mod, _name, register_model(_build))
