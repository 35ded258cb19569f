"""Training CLI — the composition root.

Re-designs the reference's `main()` wiring + epoch loop (reference
main.py:355-1153) for JAX: one process per host (not per core — no
`torch_xla.launch` spawn, reference main.py:1235-1257), a single jitted
train step instead of the torch_xla lazy-step scope, device-resident
mixup/EMA, Orbax checkpoints, and host metric pulls only at log_freq.

Run:
    python -m vision_transformers_torch_xla_tpu.launch.main \
        --model my_vit_b --data_set tfds --batch_size 128 ...
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_transformers_torch_xla_tpu.ckpt.checkpoint import CheckpointManager
from vision_transformers_torch_xla_tpu.core.config import TrainConfig, config_from_args
from vision_transformers_torch_xla_tpu.core.dtypes import get_policy
from vision_transformers_torch_xla_tpu.data.loader import (
    build_dataset,
    device_prefetch,
)
from vision_transformers_torch_xla_tpu.models import create_model
from vision_transformers_torch_xla_tpu.obs.loggers import build_loggers, is_main_process
from vision_transformers_torch_xla_tpu.obs.metrics import MetricLogger
from vision_transformers_torch_xla_tpu.parallel import sharding as shd
from vision_transformers_torch_xla_tpu.parallel.mesh import (
    axis_rules,
    create_mesh,
    init_distributed,
)
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.schedules import cosine_schedule_fn
from vision_transformers_torch_xla_tpu.train.state import TrainState, create_train_state
from vision_transformers_torch_xla_tpu.train.steps import (
    StepConfig,
    make_eval_step,
    make_train_step,
)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainerContext:
    cfg: TrainConfig
    mesh: Any
    model: Any
    state: TrainState
    train_step: Any
    eval_step: Any
    train_ds: Any
    val_ds: Any
    steps_per_epoch: int
    loggers: dict
    ckpt: Optional[CheckpointManager]
    rng: jax.Array
    teacher_params: Any = None
    start_epoch: int = 0
    watchdog: Any = None
    eval_batches: Optional[int] = None


def _to_global(arr: np.ndarray, mesh, spec: P):
    """Host-local batch -> global sharded jax.Array."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, arr)


def _put_batch(batch, mesh):
    images, labels = batch
    return (_to_global(np.asarray(images), mesh, P("data")),
            _to_global(np.asarray(labels), mesh, P("data")))


def _split_variables(loaded):
    """BN-family converters return {'params', 'batch_stats'} (flax
    collections); the rest return a bare params tree. Normalize to
    (params, batch_stats_or_None)."""
    if isinstance(loaded, dict) and "params" in loaded and \
            set(loaded) <= {"params", "batch_stats"}:
        return loaded["params"], loaded.get("batch_stats")
    return loaded, None


def _load_params_into(params, loaded, model_state=None):
    """Graft loaded leaves onto params; keep originals on shape mismatch
    except pos_embed, which is grid-resampled (reference
    utils/__init__.py:550-596 lenient load + resize_pos_embed). BatchNorm
    running stats (BN-family torch checkpoints) merge into model_state's
    batch_stats collection when given."""
    from vision_transformers_torch_xla_tpu.models.pretrained import (
        merge_into_params,
    )

    loaded, loaded_stats = _split_variables(loaded)
    out, n_loaded = merge_into_params(params, loaded)
    log.info("loaded %d params from checkpoint", n_loaded)
    if loaded_stats and model_state is not None \
            and "batch_stats" in model_state:
        merged, n_stats = merge_into_params(model_state["batch_stats"],
                                            loaded_stats, resample=False)
        model_state["batch_stats"] = merged
        log.info("loaded %d batch_stats leaves from checkpoint", n_stats)
    return out


def _explicit_resume(cfg: TrainConfig, state, start_epoch: int):
    """Restore from --resume (reference utils/__init__.py:749-770).

    Accepts an Orbax checkpoints root (restores the newest epoch), a
    specific epoch dir inside one, or a reference torch .pth (weights only,
    converted via ckpt.torch_compat).
    """
    path = cfg.resume
    if path.endswith((".pth", ".pt", ".bin")):
        from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
            load_reference_checkpoint,
        )

        loaded = load_reference_checkpoint(path, cfg.model_key,
                                           cfg.model_prefix)
        mstate = dict(state.model_state) if state.model_state else None
        new_params = _load_params_into(state.params, loaded, mstate)
        state = state.replace(params=new_params,
                              **({"model_state": mstate} if mstate else {}))
        log.info("resumed model weights from %s", path)
        return state, start_epoch
    if not os.path.isdir(path):
        raise FileNotFoundError(f"--resume: no checkpoint at {path!r}")
    root, epoch = os.path.abspath(path), None
    base = os.path.basename(root.rstrip("/"))
    if base.isdigit():  # .../checkpoints/<epoch>
        root, epoch = os.path.dirname(root), int(base)
    mngr = CheckpointManager(root)
    try:
        restored, meta = mngr.restore(state, epoch)
    finally:
        mngr.close()
    if restored is None:
        raise FileNotFoundError(f"--resume: no epochs under {root!r}")
    used = epoch if epoch is not None else (meta or {}).get("epoch")
    start_epoch = ((meta or {}).get("epoch", used or 0)) + 1
    log.info("resumed from %s at epoch %s", root, used)
    return restored, start_epoch


def setup(cfg: TrainConfig) -> TrainerContext:
    from vision_transformers_torch_xla_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    _pin_platform(cfg)
    init_distributed()
    if cfg.device:
        jax.config.update("jax_default_device", jax.devices(cfg.device)[0])
    mesh = create_mesh(cfg.parse_mesh_shape(),
                       platform=cfg.device or None)
    policy = get_policy(cfg.precision)

    data_size = mesh.shape.get("data", 1)
    if (cfg.batch_size * jax.process_count()) % data_size:
        raise ValueError(
            f"global batch {cfg.batch_size * jax.process_count()} must divide "
            f"the data mesh axis ({data_size}); adjust --batch_size")
    if cfg.eval_batch_size() % data_size and not cfg.disable_eval:
        raise ValueError(
            f"eval batch {cfg.eval_batch_size()} (= batch_size x "
            f"{cfg.eval_batch_mult}) must divide the data mesh axis "
            f"({data_size}); adjust --eval_batch_mult")

    train_ds, info = build_dataset(cfg, is_train=True)
    val_ds, val_info = build_dataset(cfg, is_train=False) \
        if not cfg.disable_eval else (None, None)
    global_batch = cfg.batch_size * jax.process_count()
    steps_per_epoch = max(info.num_examples // global_batch, 1)
    # bound eval for infinite iterators (synthetic) and parity with the
    # reference's len(dataset_val)-driven loop (reference engine.py:339)
    eval_batches = None
    if val_info is not None:
        eval_batches = max(val_info.num_examples //
                           (cfg.eval_batch_size() * jax.process_count()), 1)

    model = create_model(
        cfg.model, num_classes=cfg.nb_classes, img_size=cfg.input_size,
        drop_path_rate=cfg.drop_path, global_pool=cfg.global_pool,
        act_layer=cfg.act_layer or None,
        init_values=cfg.layer_scale_init_value or None,
        remat=cfg.grad_checkpointing,
        scan_blocks=cfg.scan_blocks or None,
        dtype=policy.compute_dtype, param_dtype=policy.param_dtype)
    # head-pair Pallas attention: +28% ViT-B step throughput on v5e; Mosaic
    # kernels need a TPU backend, so 'auto' stays off on CPU (tests, dryrun)
    want_pallas = cfg.pallas_attn == "on" or (
        cfg.pallas_attn == "auto" and cfg.device not in ("cpu",)
        and jax.default_backend() not in ("cpu",))
    if want_pallas and hasattr(model, "use_pallas_attn"):
        model = model.clone(use_pallas_attn=True)
    if cfg.pallas_mlp == "on" and hasattr(model, "use_pallas_mlp"):
        # fused-backward MLP custom VJP (ops/mlp_fused.py); explicit opt-in
        model = model.clone(use_pallas_mlp=True)

    sample = jnp.zeros((cfg.batch_size, cfg.input_size, cfg.input_size, 3),
                       jnp.float32)
    abstract = jax.eval_shape(lambda k: model.init(k, sample, True),
                              {"params": jax.random.key(cfg.seed)})
    # mutable model collections beyond params (e.g. BatchNorm batch_stats);
    # 'intermediates' are feature taps, never part of train state
    mutable_cols = tuple(k for k in abstract if k not in ("params", "intermediates"))
    all_rules = axis_rules(cfg.param_sharding, mesh)
    # make activation-sharding hints (nn.with_logical_constraint) resolve
    # inside the jitted steps; a no-op for replicated/fsdp rules
    nn.set_logical_axis_rules(all_rules)
    full_shardings = shd.params_sharding(mesh, abstract, all_rules)
    keep = ("params",) + mutable_cols

    def _init_all(k):
        variables = nn.meta.unbox(model.init(k, sample, True))
        return {c: variables[c] for c in keep}

    init_fn = jax.jit(_init_all,
                      out_shardings={c: full_shardings[c] for c in keep})
    variables = init_fn({"params": jax.random.key(cfg.seed)})
    params = variables["params"]
    model_state = {c: variables[c] for c in mutable_cols}

    from vision_transformers_torch_xla_tpu.models.pretrained import (
        apply_pretrained,
    )

    # factory-level pretrained sources (pretrained=True / local-dir: /
    # hf-hub:) attach a loaded state dict; merge it now (no-op otherwise)
    params = apply_pretrained(model, params)
    if cfg.finetune:
        if cfg.finetune.endswith((".pth", ".pt", ".bin")):
            from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
                load_reference_checkpoint,
            )

            loaded = load_reference_checkpoint(cfg.finetune, cfg.model_key,
                                               cfg.model_prefix)
        else:
            from vision_transformers_torch_xla_tpu.models.pretrained import (
                load_state_dict,
            )

            loaded = load_state_dict(cfg.finetune, model_name=cfg.model)
        params = _load_params_into(params, loaded, model_state)

    lr_fn = cosine_schedule_fn(cfg.lr, cfg.min_lr, cfg.epochs, steps_per_epoch,
                               warmup_epochs=cfg.warmup_epochs,
                               start_warmup_value=cfg.warmup_lr,
                               warmup_steps=cfg.warmup_steps)
    wd_fn = None
    if cfg.weight_decay_end is not None and cfg.weight_decay_end != cfg.weight_decay:
        wd_fn = cosine_schedule_fn(cfg.weight_decay, cfg.weight_decay_end,
                                   cfg.epochs, steps_per_epoch)
    tx = create_optimizer(
        cfg.opt, lr_fn, params, weight_decay=cfg.weight_decay,
        weight_decay_schedule=wd_fn, opt_eps=cfg.opt_eps,
        opt_betas=cfg.opt_betas, momentum=cfg.momentum,
        clip_grad=cfg.clip_grad, layer_decay=cfg.layer_decay,
        model_depth=getattr(model, "depth", 12), update_freq=cfg.update_freq)
    state = create_train_state(params, tx, with_ema=cfg.model_ema,
                               model_state=model_state)

    # knowledge distillation (reference main.py:691-742, 836-851)
    teacher_params = None
    teacher_apply = None
    if cfg.kd:
        teacher = create_model(cfg.teacher_model, num_classes=cfg.nb_classes,
                               img_size=cfg.input_size,
                               dtype=policy.compute_dtype,
                               param_dtype=policy.param_dtype)
        t_init = jax.jit(lambda k: nn.meta.unbox(
            teacher.init(k, sample, True))["params"])
        teacher_params = t_init({"params": jax.random.key(cfg.seed + 1)})
        if cfg.teacher_path:
            from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
                load_reference_checkpoint,
            )

            teacher_params = _load_params_into(
                teacher_params, load_reference_checkpoint(cfg.teacher_path))
        else:
            log.warning("KD enabled without --teacher_path: teacher is random")
        teacher_apply = teacher.apply

    mix = MixupConfig(
        mixup_alpha=cfg.mixup, cutmix_alpha=cfg.cutmix, prob=cfg.mixup_prob,
        switch_prob=cfg.mixup_switch_prob, label_smoothing=cfg.smoothing,
        num_classes=cfg.nb_classes)
    device_aug = None
    if cfg.device_augment:
        from vision_transformers_torch_xla_tpu.data.device_aug import (
            DeviceAugConfig,
            parse_aa_spec,
        )
        from vision_transformers_torch_xla_tpu.data.loader import (
            IMAGENET_DEFAULT_MEAN,
            IMAGENET_DEFAULT_STD,
            IMAGENET_INCEPTION_MEAN,
            IMAGENET_INCEPTION_STD,
        )

        aa = parse_aa_spec(cfg.aa)
        layers, mag, mstd = aa if aa else (0, 0.0, 0.0)
        default_stats = cfg.imagenet_default_mean_and_std
        device_aug = DeviceAugConfig(
            out_size=cfg.input_size, randaug_layers=layers,
            randaug_magnitude=mag, mag_std=mstd, reprob=cfg.reprob,
            color_jitter=cfg.color_jitter,
            mean=(IMAGENET_DEFAULT_MEAN if default_stats
                  else IMAGENET_INCEPTION_MEAN),
            std=(IMAGENET_DEFAULT_STD if default_stats
                 else IMAGENET_INCEPTION_STD))
    step_cfg = StepConfig(
        device_aug=device_aug,
        mixup=mix, label_smoothing=cfg.smoothing, num_classes=cfg.nb_classes,
        ema_decay=cfg.model_ema_decay if cfg.model_ema else None,
        kd_alpha=cfg.kd_alpha, kd_temperature=cfg.kd_temperature,
        lr_schedule=lr_fn)
    from vision_transformers_torch_xla_tpu.train.optim import is_second_order

    train_step = jax.jit(make_train_step(model.apply, tx, step_cfg, teacher_apply,
                                         mutable_collections=mutable_cols,
                                         second_order=is_second_order(cfg.opt)),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model.apply,
                                       mutable_collections=mutable_cols))

    ckpt = None
    start_epoch = cfg.start_epoch
    if cfg.resume:
        state, start_epoch = _explicit_resume(cfg, state, start_epoch)
    if cfg.output_dir and cfg.save_ckpt:
        import os

        ckpt = CheckpointManager(os.path.abspath(
            os.path.join(cfg.output_dir, "checkpoints")),
            max_to_keep=cfg.save_ckpt_num,
            save_interval_epochs=cfg.save_ckpt_freq)
        if cfg.auto_resume and not cfg.resume:
            restored, meta = ckpt.restore(state)
            if restored is not None:
                state = restored
                start_epoch = (meta or {}).get("epoch", ckpt.latest_epoch()) + 1
                log.info("auto-resumed at epoch %d", start_epoch)

    return TrainerContext(
        cfg=cfg, mesh=mesh, model=model, state=state, train_step=train_step,
        eval_step=eval_step, train_ds=train_ds, val_ds=val_ds,
        steps_per_epoch=steps_per_epoch, loggers=build_loggers(cfg), ckpt=ckpt,
        rng=jax.random.key(cfg.seed), teacher_params=teacher_params,
        start_epoch=start_epoch, eval_batches=eval_batches)


def train_one_epoch(ctx: TrainerContext, epoch: int,
                    max_steps: Optional[int] = None) -> dict:
    """Host loop for one epoch (reference engine.py:19-333 equivalent)."""
    cfg = ctx.cfg
    logger = MetricLogger()
    n_steps = min(ctx.steps_per_epoch, max_steps or ctx.steps_per_epoch)

    profile_at = (2 if cfg.profile_steps > 0 and epoch == ctx.start_epoch and
                  is_main_process() else -1)  # skip warmup/compile steps
    profile_dir = os.path.join(cfg.log_dir or cfg.output_dir or ".", "profile")
    tracing = False

    t0 = time.time()
    batches = device_prefetch(ctx.train_ds, lambda b: _put_batch(b, ctx.mesh))
    for i in range(n_steps):
        try:
            images, labels = next(batches)
        except StopIteration:
            break
        if i == profile_at:
            jax.profiler.start_trace(profile_dir)
            tracing = True
        if tracing and i == profile_at + cfg.profile_steps:
            jax.profiler.stop_trace()
            tracing = False
            print(f"profile trace written to {profile_dir}", flush=True)
        ctx.state, metrics = ctx.train_step(ctx.state, images, labels, ctx.rng,
                                            *([ctx.teacher_params] if
                                              ctx.teacher_params is not None else []))
        if ctx.watchdog is not None:
            ctx.watchdog.beat()
        if i % cfg.log_freq == 0 or i == n_steps - 1:
            host = {k: float(v) for k, v in metrics.items()}
            logger.update(**host)
            if is_main_process():
                ips = cfg.batch_size * jax.process_count() * (i + 1) / (time.time() - t0)
                print(f"epoch {epoch} [{i}/{n_steps}] "
                      f"loss {host['loss']:.4f} lr {host.get('lr', 0):.2e} "
                      f"grad_norm {host.get('grad_norm', 0):.2f} "
                      f"({ips:.0f} img/s)", flush=True)
            if "tb" in ctx.loggers:
                ctx.loggers["tb"].update(head="train", step=epoch * n_steps + i, **host)
    if tracing:  # epoch shorter than profile window
        jax.profiler.stop_trace()
        print(f"profile trace written to {profile_dir}", flush=True)
    logger.synchronize_between_processes()
    return {f"train_{k}": m.global_avg for k, m in logger.meters.items()}


def evaluate(ctx: TrainerContext, use_ema: bool = False,
             max_batches: Optional[int] = None) -> dict:
    """Eval pass: top-1/top-5/loss summed on device, reduced at the end
    (reference engine.py:339-430)."""
    params = ctx.state.ema_params if use_ema else ctx.state.params
    if max_batches is None:
        max_batches = ctx.eval_batches
    # accumulate metric sums on device; ONE host pull at the end — no
    # per-batch sync (the reference's engine.py:403 mark_step-per-batch /
    # .item() hazard, and round-1's float(m[k]) loop)
    keys = ("top1", "top5", "count", "loss_sum")
    accum = jax.jit(lambda t, m: {k: t[k] + m[k] for k in keys})
    totals = jax.jit(lambda: {k: jnp.zeros((), jnp.float32) for k in keys})()
    batches = device_prefetch(ctx.val_ds, lambda b: _put_batch(b, ctx.mesh))
    for bi, (images, labels) in enumerate(batches):
        if max_batches is not None and bi >= max_batches:
            break
        m = ctx.eval_step(params, images, labels, ctx.state.model_state)
        totals = accum(totals, m)
    totals = {k: float(v) for k, v in totals.items()}
    n = max(totals["count"], 1.0)
    prefix = "ema_" if use_ema else ""
    return {f"{prefix}acc1": 100.0 * totals["top1"] / n,
            f"{prefix}acc5": 100.0 * totals["top5"] / n,
            f"{prefix}loss": totals["loss_sum"] / n,
            f"{prefix}count": n}


def _pin_platform(cfg: TrainConfig) -> None:
    """Keep --device cpu runs fully off the tunneled TPU backend.

    Must precede ANY backend lookup (jax.devices / process_index / ...):
    some images register a remote TPU PJRT plugin via sitecustomize and wrap
    jax's backend resolution so even jax.devices("cpu") initializes the
    remote plugin first — which blocks in a retry loop when the tunnel is
    down. The explicit config pin is the one knob that wins (same hazard
    class as tests/conftest.py and __graft_entry__._pin_cpu_platform).
    Best-effort: a no-op when backends are already up (library callers).
    """
    if cfg.device == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def main(cfg: TrainConfig, max_steps_per_epoch: Optional[int] = None,
         max_eval_batches: Optional[int] = None) -> dict:
    _pin_platform(cfg)
    if max_steps_per_epoch is None and cfg.limit_steps_per_epoch:
        max_steps_per_epoch = cfg.limit_steps_per_epoch
    if max_eval_batches is None and cfg.limit_eval_batches:
        max_eval_batches = cfg.limit_eval_batches
    if is_main_process():
        print(f"config: {cfg}", flush=True)
        print(f"devices: {jax.device_count()} "
              f"({jax.process_count()} processes)", flush=True)
    ctx = setup(cfg)

    if cfg.eval_only:
        stats = evaluate(ctx, max_batches=max_eval_batches)
        print(f"eval: top-1 {stats['acc1']:.2f}% top-5 {stats['acc5']:.2f}%")
        return stats

    from vision_transformers_torch_xla_tpu.obs.watchdog import StepWatchdog

    watchdog = StepWatchdog(timeout_s=900.0).start()
    ctx.watchdog = watchdog
    max_accuracy = 0.0
    last_stats: dict = {}
    for epoch in range(ctx.start_epoch, cfg.epochs):
        train_stats = train_one_epoch(ctx, epoch, max_steps_per_epoch)
        stats = {"epoch": epoch, **train_stats}
        if ctx.val_ds is not None:
            eval_stats = evaluate(ctx, max_batches=max_eval_batches)
            if cfg.model_ema and cfg.model_ema_eval:
                eval_stats.update(evaluate(ctx, use_ema=True,
                                           max_batches=max_eval_batches))
            max_accuracy = max(max_accuracy, eval_stats["acc1"])
            stats.update(eval_stats)
            stats["max_accuracy"] = max_accuracy
            if is_main_process():
                print(f"epoch {epoch}: top-1 {eval_stats['acc1']:.2f}% "
                      f"(best {max_accuracy:.2f}%)", flush=True)
        if ctx.ckpt is not None:
            ctx.ckpt.save(epoch, ctx.state, metadata={"epoch": epoch})
        ctx.loggers["jsonl"].log(stats)
        if "wandb" in ctx.loggers:
            ctx.loggers["wandb"].log(stats)
        last_stats = stats
    watchdog.stop()
    if ctx.ckpt is not None:
        ctx.ckpt.wait()
        ctx.ckpt.close()
    if "wandb" in ctx.loggers:
        ctx.loggers["wandb"].finish()
    return last_stats


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main(config_from_args())
