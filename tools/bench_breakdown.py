"""Step-time breakdown for the headline bench (where do the 111 ms go?).

Times variants of the ViT-B/16 b128 step on the real chip:
  fwd            forward only
  fwd_bwd        forward + grads
  full           the headline train step (mixup+fwd+bwd+adamw+ema)
  no_ema         train step without EMA
  no_mixup       train step without on-device mixup
  xla_attn       full step with the XLA attention path (no Pallas)

Run:  python tools/bench_breakdown.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, sync, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    from flax import linen as nn

    from vision_transformers_torch_xla_tpu.core.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from vision_transformers_torch_xla_tpu import create_model
    from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
    from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
    from vision_transformers_torch_xla_tpu.train.schedules import (
        cosine_schedule_fn,
    )
    from vision_transformers_torch_xla_tpu.train.state import (
        create_train_state,
    )
    from vision_transformers_torch_xla_tpu.train.steps import (
        StepConfig,
        make_train_step,
    )

    batch = 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
    key = jax.random.key(0)

    results = {}
    for variant in ("fwd", "fwd_bwd", "full", "no_ema", "no_mixup",
                    "xla_attn"):
        pallas = variant != "xla_attn"
        model = create_model("my_vit_b", drop_path_rate=0.1,
                             use_pallas_attn=pallas)
        init_fn = jax.jit(
            lambda k, m=model: nn.meta.unbox(
                m.init(k, images, True))["params"])
        params = init_fn({"params": jax.random.key(0)})
        if variant == "fwd":
            f = jax.jit(lambda p, x: model.apply({"params": p}, x, True))
            results[variant] = timed(lambda: f(params, images),
                                     lambda o: float(o[0, 0]))
            continue
        if variant == "fwd_bwd":
            def loss_fn(p, x, y):
                logits = model.apply({"params": p}, x, True)
                oh = jax.nn.one_hot(y, 1000)
                return -jnp.mean(jnp.sum(
                    jax.nn.log_softmax(logits) * oh, axis=-1))

            g = jax.jit(jax.grad(loss_fn))
            results[variant] = timed(
                lambda: g(params, images, labels),
                lambda o: float(jax.tree.leaves(o)[0].reshape(-1)[0]))
            continue
        lr_fn = cosine_schedule_fn(4e-3, 1e-6, 300, 300, warmup_epochs=20)
        tx = create_optimizer("adamw", lr_fn, params, weight_decay=0.05,
                              clip_grad=None, model_depth=12)
        state = create_train_state(params, tx,
                                   with_ema=variant != "no_ema")
        cfg = StepConfig(
            mixup=MixupConfig(num_classes=1000, mixup_alpha=0.0,
                              cutmix_alpha=0.0, prob=0.0)
            if variant == "no_mixup" else MixupConfig(num_classes=1000),
            num_classes=1000,
            ema_decay=0.9999 if variant != "no_ema" else 0.0,
            lr_schedule=None)
        step = jax.jit(make_train_step(model.apply, tx, cfg),
                       donate_argnums=(0,))
        holder = {"s": state}

        def run(holder=holder, step=step):
            holder["s"], m = step(holder["s"], images, labels, key)
            return m

        results[variant] = timed(run, lambda m: float(m["loss"]))

    for k, v in results.items():
        print(f"{k:10s} {v * 1e3:8.2f} ms  ({batch / v:7.1f} img/s)")


if __name__ == "__main__":
    main()
