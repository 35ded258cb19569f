"""Bench the full train step for a model config; reports compile + step time."""
import sys, time, argparse
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

ap = argparse.ArgumentParser()
ap.add_argument("--model", default="my_vit_b")
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--iters", type=int, default=15)
ap.add_argument("--scan", action="store_true")
ap.add_argument("--remat", action="store_true")
ap.add_argument("--remat_policy", default="nothing")
ap.add_argument("--pallas", action="store_true")
ap.add_argument("--pallas_mlp", action="store_true",
                help="fused-backward MLP custom VJP (ops/mlp_fused.py)")
args = ap.parse_args()

t_start = time.time()
model = create_model(args.model, drop_path_rate=0.1,
                     scan_blocks=args.scan or None, remat=args.remat or None,
                     remat_policy=args.remat_policy if args.remat else None,
                     use_pallas_attn=args.pallas or None,
                     use_pallas_mlp=args.pallas_mlp or None)
x = jnp.zeros((args.batch, 224, 224, 3), jnp.float32)
init_fn = jax.jit(lambda k: nn.meta.unbox(model.init(k, x, True))["params"])
params = init_fn({"params": jax.random.key(0)})
tx = create_optimizer("adamw", 1e-3, params, weight_decay=0.05)
state = create_train_state(params, tx, with_ema=True)
cfg = StepConfig(mixup=MixupConfig(num_classes=1000), num_classes=1000, ema_decay=0.9999)
step = jax.jit(make_train_step(model.apply, tx, cfg), donate_argnums=(0,))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(args.batch,224,224,3)), jnp.float32)
labels = jnp.asarray(rng.integers(0,1000,args.batch), jnp.int32)
key = jax.random.key(0)
state, m = step(state, images, labels, key)
float(m["loss"])
t_compile = time.time() - t_start
for _ in range(2):
    state, m = step(state, images, labels, key)
float(m["loss"])
# best-of-3 chunks: drops one-off host jitter from the A/B number
dt = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, images, labels, key)
    float(m["loss"])
    dt = min(dt, (time.perf_counter()-t0)/args.iters)
print(f"{args.model} b{args.batch} scan={args.scan} remat={args.remat} "
      f"pallas={args.pallas} pallas_mlp={args.pallas_mlp}: "
      f"setup+compile {t_compile:.0f}s, {dt*1e3:.1f} ms/step, {args.batch/dt:.0f} img/s", flush=True)

# note: --device-aug variant lives in tools/bench_device_aug.py
