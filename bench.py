"""Headline benchmark: ViT-B/16 training throughput on one TPU chip.

Measures the full jitted train step (mixup + fwd + bwd + clip + AdamW + EMA,
bf16 compute / fp32 params) on synthetic data — the flagship configuration
of the reference (ViT-B/16, reference run_train.sh:14-15; EMA on, mixup 0.8 /
cutmix 1.0, AdamW, cosine schedule, reference main.py:169-230).

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
reported against the rebuild's north-star target of 40% MFU (BASELINE.json):
vs_baseline = measured_MFU / 0.40.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _peak_flops_per_sec(device) -> float:
    """bf16 peak for the benched chip."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 197e12, "v5litepod": 197e12, "v5e": 197e12,
        "v4": 275e12, "v5p": 459e12, "v6e": 918e12, "v6 lite": 918e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12  # default: v5e


def vit_train_flops_per_image(img: int = 224, patch: int = 16,
                              dim: int = 768, depth: int = 12,
                              num_classes: int = 1000) -> float:
    """Analytic FLOPs: fwd = patch proj + per-block attn/mlp + head; train = 3x fwd."""
    s = (img // patch) ** 2 + 1
    patch_proj = 2 * s * (patch * patch * 3) * dim
    per_block = (2 * s * dim * 3 * dim          # qkv
                 + 2 * s * s * dim * 2          # scores + PV
                 + 2 * s * dim * dim            # proj
                 + 2 * s * dim * 4 * dim * 2)   # mlp fc1+fc2
    head = 2 * dim * num_classes
    fwd = patch_proj + depth * per_block + head
    return 3.0 * fwd


def _init_devices_bounded(timeout_s: float = 180.0):
    """Backend init with a hard deadline.

    On this image the TPU is reached through a tunneled PJRT plugin whose
    initialization blocks in a retry sleep loop while the tunnel is down —
    an unattended bench run would hang forever. Init happens in a daemon
    thread; if it misses the deadline the process exits 1 with a clear
    message (exiting is the only reliable cancel — the blocked init holds
    a C-level call that Python can't interrupt). Normal init is <5 s; the
    deadline only trips when the chip is unreachable."""
    import os
    import sys
    import threading

    out: list = []
    t = threading.Thread(target=lambda: out.append(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        print(f"bench: TPU backend init did not complete in {timeout_s:.0f}s "
              "(tunnel down?) — aborting instead of hanging", file=sys.stderr)
        sys.stderr.flush()
        os._exit(1)
    return out[0]


def main():
    import os

    # VTX_BENCH_CPU_SMOKE=1: tiny-model CPU run exercising the full bench
    # code path (incl. the MLP autotune + donation-safe rerun logic) when
    # the chip is unreachable. Numbers are meaningless; exercised by
    # tests/test_bench_smoke.py.
    smoke = os.environ.get("VTX_BENCH_CPU_SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    from flax import linen as nn

    from vision_transformers_torch_xla_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()

    from vision_transformers_torch_xla_tpu import create_model
    from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
    from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
    from vision_transformers_torch_xla_tpu.train.schedules import cosine_schedule_fn
    from vision_transformers_torch_xla_tpu.train.state import create_train_state
    from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step

    device = jax.devices()[0] if smoke else _init_devices_bounded()[0]
    batch = 8 if smoke else 128
    img = 64 if smoke else 224
    # head-pair Pallas attention kernel: reads the fused qkv projection
    # output in place (no head transposes); +28% step throughput on v5e
    # vs the XLA attention path (tools/bench_attn.py A/B)
    model = create_model("my_vit_mini" if smoke else "my_vit_b",
                         drop_path_rate=0.1, use_pallas_attn=not smoke,
                         **({"img_size": img, "depth": 2} if smoke else {}))

    images_host = jnp.zeros((batch, img, img, 3), jnp.float32)
    init_fn = jax.jit(
        lambda k: nn.meta.unbox(model.init(k, images_host, True))["params"])
    params = init_fn({"params": jax.random.key(0)})
    del images_host

    lr_fn = cosine_schedule_fn(4e-3, 1e-6, 300, 300, warmup_epochs=20)
    # single-HBM-pass AdamW+EMA+grad-norm (train/fused.py): guarantees one
    # multi-output elementwise fusion per leaf instead of relying on XLA to
    # fuse the optax chain (measured ~0.4 ms/step on v5e — XLA already fuses
    # most of it; kept because the guarantee is free and recipe-portable)
    from vision_transformers_torch_xla_tpu.train.optim import maybe_fused_optimizer

    tx = maybe_fused_optimizer("adamw", lr_fn, params, weight_decay=0.05,
                               clip_grad=None, ema_decay=0.9999)
    assert tx is not None
    cfg = StepConfig(mixup=MixupConfig(num_classes=1000), num_classes=1000,
                     ema_decay=0.9999, lr_schedule=None)

    import numpy as np

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, img, img, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
    key = jax.random.key(0)

    def timed_run(variant_model, iters):
        """Fresh state -> warmup -> timed loop. Returns (step_time, loss).

        NOTE: on this image's relay backend jax.block_until_ready does not
        actually block, so synchronization is an explicit host read of a
        scalar that depends on every step.
        """
        step = jax.jit(make_train_step(variant_model.apply, tx, cfg),
                       donate_argnums=(0,))
        # fresh params every run: the step donates the state, whose leaves
        # alias the params buffers — reusing them across runs would read
        # donated (invalidated) arrays. init_fn is jitted + cached.
        state = create_train_state(init_fn({"params": jax.random.key(0)}),
                                   tx, with_ema=True)
        for _ in range(3):
            state, metrics = step(state, images, labels, key)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, images, labels, key)
        loss = float(metrics["loss"])  # forces the whole chain
        return (time.perf_counter() - t0) / iters, loss

    # Autotune the MLP path: the fused-backward Pallas MLP kernel
    # (ops/mlp_fused.py, opt-in) vs XLA's fusion of the same ops. Measured
    # here rather than hard-coded because the winner is hardware-dependent;
    # any failure in the experimental kernel falls back to the XLA path.
    import sys

    mlp_variant = "xla"
    t_xla, _ = timed_run(model, 8)
    best_t = t_xla
    try:
        t_pallas, _ = timed_run(model.clone(use_pallas_mlp=True), 8)
        print(f"bench: mlp autotune xla={t_xla * 1e3:.2f}ms "
              f"pallas={t_pallas * 1e3:.2f}ms", file=sys.stderr)
        if t_pallas < t_xla:
            mlp_variant, best_t = "pallas", t_pallas
    except Exception as e:  # noqa: BLE001 — bench must always report
        print(f"bench: pallas_mlp variant failed ({type(e).__name__}: {e}); "
              "using the XLA MLP path", file=sys.stderr)

    bench_model = model.clone(use_pallas_mlp=True) if mlp_variant == "pallas" \
        else model
    step_time, final_loss = timed_run(bench_model, 20)
    ips = batch / step_time
    mfu = ips * vit_train_flops_per_image() / _peak_flops_per_sec(device)

    print(json.dumps({
        "metric": "vit_b16_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu / 0.40, 4),
        "step_time_ms": round(step_time * 1e3, 2),
        "mfu": round(mfu, 4),
        "batch": batch,
        "device": str(getattr(device, "device_kind", device)),
        "loss": round(final_loss, 4),
        "mlp_variant": mlp_variant,
    }))


if __name__ == "__main__":
    main()
