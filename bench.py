"""Headline benchmark: ViT training throughput on one TPU chip.

Measures the full jitted train step (mixup + fwd + bwd + clip + AdamW + EMA,
bf16 compute / fp32 params) on synthetic data — the flagship configuration
of the reference (ViT-B/16, reference run_train.sh:14-15; EMA on, mixup 0.8 /
cutmix 1.0, AdamW, cosine schedule, reference main.py:169-230). Also records
ViT-L/16 @ batch 64 so the large-model regime (where remat/scan choices bite)
is driver-visible, as extra fields on the same JSON line.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is
reported against the rebuild's north-star target of 40% MFU (BASELINE.json):
vs_baseline = measured_MFU / 0.40.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import sys
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


class _ModelBench:
    """One model's bench harness: state factory + timed step runner."""

    def __init__(self, name: str, batch: int, img: int, *, smoke: bool,
                 device_aug: bool = False, **model_kw):
        from flax import linen as nn

        from vision_transformers_torch_xla_tpu import create_model
        from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
        from vision_transformers_torch_xla_tpu.train.optim import (
            maybe_fused_optimizer,
        )
        from vision_transformers_torch_xla_tpu.train.schedules import (
            cosine_schedule_fn,
        )
        from vision_transformers_torch_xla_tpu.train.state import (
            create_train_state,
        )
        from vision_transformers_torch_xla_tpu.train.steps import (
            StepConfig, make_train_step,
        )

        self.batch = batch
        # head-pair Pallas attention kernel: reads the fused qkv projection
        # output in place (no head transposes); +28% step throughput on v5e
        # vs the XLA attention path (tools/bench_attn.py A/B).
        # act gelu_tanh + avg pool = the flagship recipe
        # (scripts/train_vit_b_v4_64.sh; reference main.py:647 pools avg):
        # tanh-gelu saves 7.8 ms/step over the parity-default exact-erf
        # GELU (104.09 vs 111.88 ms, r5 on-chip A/B)
        model_kw.setdefault("act_layer", "gelu_tanh")
        model_kw.setdefault("global_pool", "avg")
        self.model = create_model(name, drop_path_rate=0.1,
                                  use_pallas_attn=not smoke, **model_kw)
        images_host = jnp.zeros((batch, img, img, 3), jnp.float32)
        self._init_fn = jax.jit(
            lambda k: nn.meta.unbox(
                self.model.init(k, images_host, True))["params"])
        params = self._init_fn({"params": jax.random.key(0)})

        lr_fn = cosine_schedule_fn(4e-3, 1e-6, 300, 300, warmup_epochs=20)
        # single-HBM-pass AdamW+EMA+grad-norm (train/fused.py): guarantees one
        # multi-output elementwise fusion per leaf instead of relying on XLA
        # to fuse the optax chain (measured ~0.4 ms/step on v5e — XLA already
        # fuses most of it; kept because the guarantee is free)
        self.tx = maybe_fused_optimizer("adamw", lr_fn, params,
                                        weight_decay=0.05, clip_grad=None,
                                        ema_decay=0.9999)
        assert self.tx is not None
        del params
        aug_cfg = None
        if device_aug:
            from vision_transformers_torch_xla_tpu.data.device_aug import (
                DeviceAugConfig,
            )

            aug_cfg = DeviceAugConfig(out_size=img, randaug_layers=2)
        self.cfg = StepConfig(mixup=MixupConfig(num_classes=1000),
                              num_classes=1000, ema_decay=0.9999,
                              lr_schedule=None, device_aug=aug_cfg)
        self._make_train_step = make_train_step
        self._create_train_state = create_train_state

        import numpy as np

        rng = np.random.default_rng(0)
        # aug-on feeds raw [0,1] frames slightly larger than the crop, as
        # the real loader does (native decode -> device RRC to `img`)
        in_size = img + 32 if device_aug else img
        self.images = jnp.asarray(
            rng.random((batch, in_size, in_size, 3)) if device_aug
            else rng.normal(size=(batch, img, img, 3)), jnp.float32)
        self.labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
        self.key = jax.random.key(0)

    def timed_run(self, variant_model, iters, chunks: int = 3):
        """Fresh state -> warmup -> `chunks` timed loops of `iters` steps;
        returns (best chunk's step_time, loss).

        Taking the best of several synced chunks removes one-off host
        jitter (compile-cache writes after the first execution, queue
        ramp-up, tunnel hiccups) that a single timed loop folds into the
        mean — r3's driver artifact read ~4 ms/step slower than the same
        build measured steady-state; profiler-checked device time matches
        the best chunk, not the jittery first one.

        NOTE: on this image's relay backend jax.block_until_ready does not
        actually block, so synchronization is an explicit host read of a
        scalar that depends on every step.
        """
        step = jax.jit(
            self._make_train_step(variant_model.apply, self.tx, self.cfg),
            donate_argnums=(0,))
        # fresh params every run: the step donates the state, whose leaves
        # alias the params buffers — reusing them across runs would read
        # donated (invalidated) arrays. _init_fn is jitted + cached.
        state = self._create_train_state(
            self._init_fn({"params": jax.random.key(0)}), self.tx,
            with_ema=True)
        for _ in range(3):
            state, metrics = step(state, self.images, self.labels, self.key)
        float(metrics["loss"])
        best = float("inf")
        loss = 0.0
        for _ in range(chunks):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, self.images, self.labels,
                                      self.key)
            loss = float(metrics["loss"])  # forces the whole chain
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, loss


def main():
    # VTX_BENCH_CPU_SMOKE=1: tiny-model CPU run exercising the full bench
    # code path (incl. the MLP autotune + donation-safe rerun logic) when
    # the chip is unreachable. Numbers are meaningless; exercised by
    # tests/test_bench_smoke.py.
    smoke = os.environ.get("VTX_BENCH_CPU_SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    from vision_transformers_torch_xla_tpu.core.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    device = jax.devices()[0] if smoke else _init_devices_bounded()[0]

    b = _ModelBench("my_vit_mini" if smoke else "my_vit_b",
                    batch=8 if smoke else 128, img=64 if smoke else 224,
                    smoke=smoke,
                    **({"img_size": 64, "depth": 2} if smoke else {}))

    # Autotune the MLP path: the fused-backward Pallas MLP kernel
    # (ops/mlp_fused.py, opt-in) vs XLA's fusion of the same ops. Measured
    # here rather than hard-coded because the winner is hardware-dependent;
    # any failure in the experimental kernel falls back to the XLA path.
    mlp_variant = "xla"
    t_xla, _ = b.timed_run(b.model, 8)
    try:
        t_pallas, _ = b.timed_run(b.model.clone(use_pallas_mlp=True), 8)
        print(f"bench: mlp autotune xla={t_xla * 1e3:.2f}ms "
              f"pallas={t_pallas * 1e3:.2f}ms", file=sys.stderr)
        if t_pallas < t_xla:
            mlp_variant = "pallas"
    except Exception as e:  # noqa: BLE001 — bench must always report
        print(f"bench: pallas_mlp variant failed ({type(e).__name__}: {e}); "
              "using the XLA MLP path", file=sys.stderr)

    bench_model = (b.model.clone(use_pallas_mlp=True)
                   if mlp_variant == "pallas" else b.model)
    # 60 iters/chunk: each chunk's wall time includes one pipeline fill
    # (~1 tunnel RTT ≈ 30 ms before the device queue is primed) — at 20
    # iters that leaves ~1.5 ms/step of launch latency in the reading vs
    # the profiler-measured 103.8 ms module span; 60 bounds it at ~0.5 ms
    step_time, final_loss = b.timed_run(bench_model, 60 if not smoke else 20)
    ips = b.batch / step_time
    flops_b = vit_train_flops_per_image(img=64 if smoke else 224,
                                        dim=b.model.embed_dim,
                                        depth=b.model.depth)
    mfu = ips * flops_b / _peak_flops_per_sec(device)

    result = {
        "metric": "vit_b16_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu / 0.40, 4),
        "step_time_ms": round(step_time * 1e3, 2),
        "mfu": round(mfu, 4),
        "batch": b.batch,
        "device": str(getattr(device, "device_kind", device)),
        "loss": round(final_loss, 4),
        "mlp_variant": mlp_variant,
    }

    # Flagship config with on-device augmentation (the real recipe runs
    # RRC+flip+RandAugment; VERDICT r3 task 7 asks for this driver-visible):
    # same step plus the jitted aug prologue on raw 256px frames.
    if not smoke:
        try:
            ba = _ModelBench("my_vit_b", batch=128, img=224, smoke=False,
                             device_aug=True)
            at, _ = ba.timed_run(
                ba.model.clone(use_pallas_mlp=True)
                if mlp_variant == "pallas" else ba.model, 30)
            result.update({
                "device_aug_step_time_ms": round(at * 1e3, 2),
                "device_aug_gap_ms": round((at - step_time) * 1e3, 2),
                "device_aug_images_per_sec": round(ba.batch / at, 2),
            })
        except Exception as e:  # noqa: BLE001 — never lose the headline
            print(f"bench: device-aug pass failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    # Large-model regime (VERDICT r3 task 8): ViT-L/16 @ batch 64, same
    # step, recorded on the same line so the driver artifact carries it.
    if not smoke:
        try:
            bl = _ModelBench("my_vit_l", batch=64, img=224, smoke=False)
            lt, _ = bl.timed_run(bl.model, 30)
            l_ips = bl.batch / lt
            l_mfu = (l_ips * vit_train_flops_per_image(dim=1024, depth=24)
                     / _peak_flops_per_sec(device))
            result.update({
                "vit_l16_images_per_sec": round(l_ips, 2),
                "vit_l16_step_time_ms": round(lt * 1e3, 2),
                "vit_l16_mfu": round(l_mfu, 4),
                "vit_l16_batch": bl.batch,
            })
        except Exception as e:  # noqa: BLE001 — never lose the headline
            print(f"bench: ViT-L pass failed ({type(e).__name__}: {e})",
                  file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
