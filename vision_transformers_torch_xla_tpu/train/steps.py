"""Jitted train / eval steps.

This is the TPU-native replacement for the reference hot loop
(reference engine.py:19-333): everything the reference staged through
torch_xla lazy tracing — mixup (host-side there), forward, loss, backward,
clip, optimizer update, EMA — is one pure function compiled once by XLA.
Gradient all-reduce across the 'data' mesh axis is inserted automatically by
the GSPMD partitioner (the reference spelled it as
`xm.optimizer_step(optimizer, barrier=True)`, engine.py:185).

Metrics come back as device scalars; callers pull them at `log_freq`
cadence only (the reference's per-step `loss.item()` device round-trips at
engine.py:218-224 are the documented step-time hazard, SURVEY §3.3).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax

import optax

from vision_transformers_torch_xla_tpu.train.losses import (
    cross_entropy,
    distillation_loss,
    soft_target_cross_entropy,
    topk_correct,
)
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig, mixup_cutmix, smoothed_one_hot
from vision_transformers_torch_xla_tpu.train.state import TrainState, ema_update


@dataclasses.dataclass(frozen=True)
class StepConfig:
    mixup: MixupConfig = MixupConfig()
    label_smoothing: float = 0.1
    num_classes: int = 1000
    ema_decay: Optional[float] = None       # None disables EMA
    kd_alpha: float = 0.5                   # used when teacher_apply is given
    kd_temperature: float = 4.0
    lr_schedule: Optional[Callable] = None  # step -> lr, for metrics only
    device_aug: Optional[Any] = None        # DeviceAugConfig: on-device RRC/
    # flip/RandAugment/normalize; images then arrive raw in [0,1]


def make_train_step(model_apply: Callable, tx: optax.GradientTransformation,
                    cfg: StepConfig,
                    teacher_apply: Optional[Callable] = None,
                    mutable_collections: tuple = (),
                    second_order: bool = False) -> Callable:
    """Returns train_step(state, images, labels, rng, [teacher_params]).

    model_apply(params_dict, images, deterministic, rngs) -> logits.
    With `teacher_apply`, the KD path matches reference main.py:836-851
    (StudentWithDistillation: teacher frozen, eval mode, no grad) + :939-970.
    `mutable_collections` (e.g. ("batch_stats",)) are threaded through
    TrainState.model_state for BatchNorm-style models.
    `second_order` (reference engine.py:247-250's is_second_order /
    create_graph path) adds a Hutchinson Hessian-diagonal estimate via
    forward-over-reverse jvp and feeds it to the optimizer as the
    `hessian_diag` extra arg (AdaHessian).
    """

    def train_step(state: TrainState, images: jax.Array, labels: jax.Array,
                   rng: jax.Array, teacher_params: Any = None):
        step_rng = jax.random.fold_in(rng, state.step)
        mix_rng, dropout_rng, droppath_rng, aug_rng, hess_rng = \
            jax.random.split(step_rng, 5)

        if cfg.device_aug is not None:
            from vision_transformers_torch_xla_tpu.data.device_aug import augment_batch

            images = augment_batch(aug_rng, images, cfg.device_aug)

        if cfg.mixup.enabled:
            images, targets = mixup_cutmix(mix_rng, images, labels, cfg.mixup)
        else:
            targets = smoothed_one_hot(labels, cfg.num_classes, cfg.label_smoothing)

        def loss_fn(params):
            variables = {"params": params}
            if mutable_collections:
                variables.update(state.model_state)
                logits, new_mstate = model_apply(
                    variables, images, False,
                    rngs={"dropout": dropout_rng, "droppath": droppath_rng},
                    mutable=list(mutable_collections))
            else:
                logits = model_apply(
                    variables, images, False,
                    rngs={"dropout": dropout_rng, "droppath": droppath_rng})
                new_mstate = state.model_state
            loss = soft_target_cross_entropy(logits, targets)
            if teacher_apply is not None:
                t_logits = jax.lax.stop_gradient(
                    teacher_apply({"params": teacher_params}, images, True))
                loss = distillation_loss(logits, t_logits, loss,
                                         cfg.kd_alpha, cfg.kd_temperature)
            return loss, new_mstate

        (loss, new_mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        extra_args = {}
        if second_order:
            from vision_transformers_torch_xla_tpu.train.adahessian import hutchinson_diag

            grad_fn = lambda p: jax.grad(loss_fn, has_aux=True)(p)[0]
            extra_args["hessian_diag"] = hutchinson_diag(
                grad_fn, state.params, hess_rng)
        if hasattr(tx, "fused_update"):
            # single-HBM-pass AdamW+EMA+grad-norm (train/fused.py); replaces
            # the three passes below when the recipe is plain adamw
            new_params, new_opt_state, new_ema, grad_norm = tx.fused_update(
                grads, state.opt_state, state.params, state.ema_params)
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               state.params, **extra_args)
            new_params = optax.apply_updates(state.params, updates)
            grad_norm = optax.global_norm(grads)
            new_ema = state.ema_params
            if cfg.ema_decay is not None and state.ema_params is not None:
                new_ema = ema_update(state.ema_params, new_params,
                                     cfg.ema_decay)

        new_state = state.replace(
            step=state.step + 1, params=new_params,
            opt_state=new_opt_state, ema_params=new_ema,
            model_state=new_mstate)

        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
        }
        if cfg.lr_schedule is not None:
            metrics["lr"] = cfg.lr_schedule(state.step)
        return new_state, metrics

    return train_step


def make_eval_step(model_apply: Callable,
                   mutable_collections: tuple = ()) -> Callable:
    """eval_step(params, images, labels) -> summable metric dict.

    Parity with reference engine.py:339-430 (CE loss, top-1/top-5); counts
    are sums so the cross-process reduction the reference does explicitly
    (engine.py:423) falls out of jit when batches are sharded over 'data'.
    """

    def eval_step(params: Any, images: jax.Array, labels: jax.Array,
                  model_state: Any = None):
        variables = {"params": params}
        if mutable_collections and model_state:
            variables.update(model_state)
        logits = model_apply(variables, images, True)
        metrics = topk_correct(logits, labels, ks=(1, 5))
        n = labels.shape[0]
        metrics["loss_sum"] = cross_entropy(logits, labels) * n
        return metrics

    return eval_step
