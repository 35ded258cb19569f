import time; t0=time.time()
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from flax import linen as nn
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.parallel.mesh import create_mesh, axis_rules
from vision_transformers_torch_xla_tpu.parallel import sharding as shd
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.schedules import cosine_schedule_fn
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = create_mesh([('data', 4), ('model', 2)], platform='cpu')
print('mesh', mesh.shape)
rules = axis_rules('replicated')

m = VisionTransformer(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
                      num_classes=10, drop_path_rate=0.1, dtype=jnp.float32)
x = jnp.ones((8, 32, 32, 3), jnp.float32)

abstract = jax.eval_shape(lambda k: m.init(k, x, True), {'params': jax.random.key(0)})
param_shardings = shd.params_sharding(mesh, abstract, rules)['params']
print('sharding resolved', round(time.time()-t0,1))

init_fn = jax.jit(lambda k: nn.meta.unbox(m.init(k, x, True))['params'],
                  out_shardings=param_shardings)
params = init_fn({'params': jax.random.key(0)})
print('init done', round(time.time()-t0,1))

lr_fn = cosine_schedule_fn(1e-3, 1e-5, 2, 10, warmup_epochs=1)
tx = create_optimizer('adamw', lr_fn, params, weight_decay=0.05, clip_grad=1.0, model_depth=2)
state = create_train_state(params, tx, with_ema=True)

cfg = StepConfig(mixup=MixupConfig(num_classes=10), num_classes=10, ema_decay=0.999, lr_schedule=lr_fn)
train_step = make_train_step(m.apply, tx, cfg)

xsh = NamedSharding(mesh, P('data'))
step = jax.jit(train_step, donate_argnums=(0,))
images = jax.device_put(x, xsh)
labels = jax.device_put(jnp.arange(8) % 10, NamedSharding(mesh, P('data')))
rng = jax.random.key(42)
losses = []
for i in range(5):
    state, metrics = step(state, images, labels, rng)
    losses.append(float(metrics['loss']))
print('losses', [round(l,4) for l in losses])
print('lr now', float(metrics['lr']))
qkv = state.params['blocks_0']['attn']['qkv']['kernel']
print('qkv sharding:', qkv.sharding)
print('TOTAL', round(time.time()-t0,1))
