"""A/B ViT-B train step: Pallas fused attention vs XLA attention."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from flax import linen as nn
from vision_transformers_torch_xla_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
from vision_transformers_torch_xla_tpu import create_model
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step

def bench(use_pallas, batch=128, iters=15):
    model = create_model("my_vit_b", drop_path_rate=0.1, use_pallas_attn=use_pallas)
    x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    init_fn = jax.jit(lambda k: nn.meta.unbox(model.init(k, x, True))["params"])
    params = init_fn({"params": jax.random.key(0)})
    tx = create_optimizer("adamw", 1e-3, params, weight_decay=0.05)
    state = create_train_state(params, tx, with_ema=True)
    cfg = StepConfig(mixup=MixupConfig(num_classes=1000), num_classes=1000, ema_decay=0.9999)
    step = jax.jit(make_train_step(model.apply, tx, cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch,224,224,3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0,1000,batch), jnp.int32)
    key = jax.random.key(0)
    for _ in range(3):
        state, m = step(state, images, labels, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, images, labels, key)
    float(m["loss"])
    dt = (time.perf_counter()-t0)/iters
    print(f"pallas={use_pallas} batch={batch}: {dt*1e3:.1f} ms/step, {batch/dt:.0f} img/s", flush=True)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    if which in ("xla", "both"): bench(False, batch)
    if which in ("pallas", "both"): bench(True, batch)
