"""Losses: label-smoothing CE, soft-target CE, and the KD loss.

Parity targets:
  * LabelSmoothingCrossEntropy / SoftTargetCrossEntropy — the reference uses
    timm's (selection at reference main.py:926-935).
  * DistillationLoss — (1-α)·CE + α·T²·KL(log_softmax(s/T) ‖ softmax(t/T)),
    reference main.py:939-970.
All reductions in fp32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  smoothing: float = 0.0) -> jax.Array:
    """Mean CE over the batch with optional label smoothing (int labels)."""
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if smoothing > 0.0:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - smoothing) * nll + smoothing * smooth
    return nll.mean()


def soft_target_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """CE against a soft target distribution (mixup/cutmix path)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return (-targets.astype(jnp.float32) * logp).sum(axis=-1).mean()


def distillation_loss(student_logits: jax.Array, teacher_logits: jax.Array,
                      base_loss: jax.Array, alpha: float,
                      temperature: float) -> jax.Array:
    """(1-α)·base + α·T²·KL(log_softmax(s/T) ‖ softmax(t/T)).

    Matches reference main.py:947-965 (batchmean KL, detached teacher).
    """
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = (p_t * (jnp.log(jnp.clip(p_t, 1e-12)) - s)).sum(axis=-1).mean()
    return (1.0 - alpha) * base_loss + alpha * (t * t) * kl


def topk_correct(logits: jax.Array, labels: jax.Array, ks=(1, 5)) -> dict:
    """Counts of top-k correct predictions (summable across batches/devices).

    Replaces timm.utils.accuracy usage at reference engine.py:339-430.
    """
    out = {}
    max_k = max(ks)
    _, top_idx = jax.lax.top_k(logits.astype(jnp.float32), max_k)
    match = top_idx == labels[:, None]
    for k in ks:
        out[f"top{k}"] = match[:, :k].any(axis=-1).sum()
    out["count"] = jnp.asarray(labels.shape[0], jnp.int32)
    return out
