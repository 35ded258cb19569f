"""Device-resident Mixup / CutMix.

The reference applies timm's `Mixup` on the HOST before device transfer
(reference engine.py:132-133, configured at main.py:622-629) — a step-time
hazard on TPU. Here the same 'batch'-mode semantics run *inside* the jitted
train step on device: one Bernoulli(prob) gate per step, a mixup/cutmix
switch with `switch_prob`, a single Beta(α,α) lambda per batch, pairing each
sample with its batch-flip, and smoothed soft targets
(timm.data.mixup one_hot: on = 1-s+s/C, off = s/C).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8       # reference --mixup (main.py:214)
    cutmix_alpha: float = 1.0      # reference --cutmix (main.py:217)
    prob: float = 1.0              # --mixup_prob
    switch_prob: float = 0.5       # --mixup_switch_prob
    label_smoothing: float = 0.1   # --smoothing
    num_classes: int = 1000

    @property
    def enabled(self) -> bool:
        return self.mixup_alpha > 0.0 or self.cutmix_alpha > 0.0


def smoothed_one_hot(labels: jax.Array, num_classes: int,
                     smoothing: float) -> jax.Array:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * (on - off) + off


def _rand_bbox(rng: jax.Array, h: int, w: int, lam: jax.Array):
    """timm rand_bbox: cut ratio sqrt(1-lam), center uniform, clipped box."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    return y0, y1, x0, x1


def mixup_cutmix(rng: jax.Array, images: jax.Array, labels: jax.Array,
                 cfg: MixupConfig):
    """Apply batch-mode mixup/cutmix. images NHWC, labels int.

    Returns (mixed_images, soft_targets[fp32]). Everything is traceable:
    branches are lax.cond, box sizes become masks.
    """
    targets = smoothed_one_hot(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.enabled:
        return images, targets

    k_gate, k_switch, k_lam, k_box = jax.random.split(rng, 4)
    apply_aug = jax.random.bernoulli(k_gate, cfg.prob)
    both = cfg.mixup_alpha > 0.0 and cfg.cutmix_alpha > 0.0
    if both:
        use_cutmix = jax.random.bernoulli(k_switch, cfg.switch_prob)
    else:
        use_cutmix = jnp.asarray(cfg.cutmix_alpha > 0.0)

    alpha_mix = max(cfg.mixup_alpha, 1e-8)
    alpha_cut = max(cfg.cutmix_alpha, 1e-8)
    lam_mix = jax.random.beta(k_lam, alpha_mix, alpha_mix)
    lam_cut = jax.random.beta(k_lam, alpha_cut, alpha_cut)

    flipped_images = images[::-1]
    flipped_targets = targets[::-1]
    h, w = images.shape[1], images.shape[2]

    def do_mixup(_):
        lam = lam_mix.astype(jnp.float32)
        mixed = images.astype(jnp.float32) * lam + \
            flipped_images.astype(jnp.float32) * (1.0 - lam)
        return mixed.astype(images.dtype), lam

    def do_cutmix(_):
        y0, y1, x0, x1 = _rand_bbox(k_box, h, w, lam_cut)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        in_box = (row >= y0) & (row < y1) & (col >= x0) & (col < x1)
        mixed = jnp.where(in_box[None, :, :, None], flipped_images, images)
        # corrected lambda from actual box area (timm cutmix semantics)
        lam = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / float(h * w)
        return mixed, lam

    mixed, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, operand=None)
    soft = targets * lam + flipped_targets * (1.0 - lam)

    out_images = jnp.where(apply_aug, mixed, images)
    out_targets = jnp.where(apply_aug, soft, targets)
    return out_images, out_targets
