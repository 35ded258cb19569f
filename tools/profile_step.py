"""Capture a jax.profiler trace of the headline train step and print the
top HLO ops by self-time (parsed from the xplane via
tensorboard_plugin_profile's raw-to-tool converter).

Run:  python tools/profile_step.py [logdir]
"""
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_step():
    from flax import linen as nn

    from vision_transformers_torch_xla_tpu import create_model
    from vision_transformers_torch_xla_tpu.core.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
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
        StepConfig,
        make_train_step,
    )

    batch = 128
    model = create_model("my_vit_b", drop_path_rate=0.1, use_pallas_attn=True)
    x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    init_fn = jax.jit(
        lambda k: nn.meta.unbox(model.init(k, x, True))["params"])
    params = init_fn({"params": jax.random.key(0)})
    lr_fn = cosine_schedule_fn(4e-3, 1e-6, 300, 300, warmup_epochs=20)
    tx = maybe_fused_optimizer("adamw", lr_fn, params, weight_decay=0.05,
                               ema_decay=0.9999)
    state = create_train_state(params, tx, with_ema=True)
    cfg = StepConfig(mixup=MixupConfig(num_classes=1000), num_classes=1000,
                     ema_decay=0.9999, lr_schedule=None)
    step = jax.jit(make_train_step(model.apply, tx, cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
    return step, state, images, labels


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vtx_profile"
    step, state, images, labels = build_step()
    key = jax.random.key(0)
    for _ in range(3):
        state, metrics = step(state, images, labels, key)
    float(metrics["loss"])

    jax.profiler.start_trace(logdir)
    for _ in range(5):
        state, metrics = step(state, images, labels, key)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    if not xplanes:
        print("no xplane captured")
        return
    xp = xplanes[-1]
    print("xplane:", xp)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data = rtd.xspace_to_tool_data([xp], "hlo_op_profile", {})
    out = os.path.join(logdir, "hlo_op_profile.txt")
    blob = data[0] if isinstance(data, tuple) else data
    if isinstance(blob, bytes):
        blob = blob.decode("utf-8", "replace")
    with open(out, "w") as f:
        f.write(str(blob))
    print("wrote", out, len(str(blob)))


if __name__ == "__main__":
    main()
