"""Measure the on-device augmentation cost inside the ViT-B train step."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from flax import linen as nn
from vision_transformers_torch_xla_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
from vision_transformers_torch_xla_tpu import create_model
from vision_transformers_torch_xla_tpu.data.device_aug import DeviceAugConfig
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step

batch = 128
model = create_model("my_vit_b", drop_path_rate=0.1, use_pallas_attn=True)
x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
init_fn = jax.jit(lambda k: nn.meta.unbox(model.init(k, x, True))["params"])
params = init_fn({"params": jax.random.key(0)})
tx = create_optimizer("adamw", 1e-3, params, weight_decay=0.05)

for aug in (None, DeviceAugConfig(out_size=224, randaug_layers=2)):
    state = create_train_state(params, tx, with_ema=True)
    cfg = StepConfig(mixup=MixupConfig(num_classes=1000), num_classes=1000,
                     ema_decay=0.9999, device_aug=aug)
    step = jax.jit(make_train_step(model.apply, tx, cfg))
    rng = np.random.default_rng(0)
    # raw [0,1] images at 256 so RRC crops down to 224
    size = 256 if aug is not None else 224
    images = jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
    key = jax.random.key(0)
    state, m = step(state, images, labels, key); float(m["loss"])
    dt = float("inf")  # best-of-3 chunks: drops one-off host jitter
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            state, m = step(state, images, labels, key)
        float(m["loss"])
        dt = min(dt, (time.perf_counter() - t0) / 10)
    print(f"device_aug={'on' if aug else 'off'}: {dt*1e3:.1f} ms/step "
          f"({batch/dt:.0f} img/s)", flush=True)
