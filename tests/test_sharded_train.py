"""Integration: sharded train/eval steps on a fake 8-device CPU mesh.

This is the rebuild's version of the reference's only distributed test
(reference tools/test_tfds_loader_multihost.py): DP gradient correctness and
TP sharding execute on a (data=4, model=2) mesh without hardware.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.parallel import sharding as shd
from vision_transformers_torch_xla_tpu.parallel.mesh import axis_rules, create_mesh
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.schedules import cosine_schedule_fn
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import (
    StepConfig,
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup(cpu_devices, tiny_model_kwargs):
    mesh = create_mesh([("data", 4), ("model", 2)], devices=cpu_devices[:8])
    m = VisionTransformer(**tiny_model_kwargs, drop_path_rate=0.1,
                          dtype=jnp.float32)
    x = jnp.ones((8, 32, 32, 3), jnp.float32)
    abstract = jax.eval_shape(lambda k: m.init(k, x, True),
                              {"params": jax.random.key(0)})
    shardings = shd.params_sharding(mesh, abstract, axis_rules())["params"]
    init_fn = jax.jit(lambda k: nn.meta.unbox(m.init(k, x, True))["params"],
                      out_shardings=shardings)
    params = init_fn({"params": jax.random.key(0)})
    return mesh, m, params


def test_param_shardings(setup):
    mesh, m, params = setup
    qkv = params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")
    fc1 = params["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, "model")
    fc2 = params["blocks_0"]["mlp"]["fc2"]["kernel"]
    assert fc2.sharding.spec == P("model", None)
    pos = params["pos_embed"]
    assert pos.sharding.spec in (P(), P(None, None, None))


def test_train_loss_decreases(setup):
    mesh, m, params = setup
    lr_fn = cosine_schedule_fn(1e-3, 1e-5, 2, 10, warmup_epochs=0)
    params = jax.tree.map(jnp.copy, params)  # donated below; keep fixture alive
    tx = create_optimizer("adamw", lr_fn, params, weight_decay=0.05,
                          clip_grad=1.0, model_depth=2)
    state = create_train_state(params, tx, with_ema=True)
    cfg = StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                                       num_classes=10),
                     num_classes=10, ema_decay=0.99, lr_schedule=lr_fn)
    step = jax.jit(make_train_step(m.apply, tx, cfg), donate_argnums=(0,))

    xsh = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32), xsh)
    labels = jax.device_put(jnp.asarray(rng.integers(0, 10, 8)),
                            NamedSharding(mesh, P("data")))
    losses = []
    st = state
    for i in range(8):
        st, metrics = step(st, images, labels, jax.random.key(7))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(st.step) == 8
    # EMA trails params
    p0 = jax.tree.leaves(st.params)[0]
    e0 = jax.tree.leaves(st.ema_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(e0))


def test_eval_step_counts(setup):
    mesh, m, params = setup
    eval_step = jax.jit(make_eval_step(m.apply))
    xsh = NamedSharding(mesh, P("data"))
    images = jax.device_put(jnp.zeros((8, 32, 32, 3), jnp.float32), xsh)
    labels = jax.device_put(jnp.zeros(8, jnp.int32),
                            NamedSharding(mesh, P("data")))
    metrics = eval_step(params, images, labels)
    assert int(metrics["count"]) == 8
    assert 0 <= int(metrics["top1"]) <= int(metrics["top5"]) <= 8


def test_dp_grad_equivalence(cpu_devices, tiny_model_kwargs):
    """Sharded-batch loss == single-device loss on the same global batch
    (the invariant xm.optimizer_step's all-reduce provides in the reference)."""
    mesh = create_mesh([("data", 4)], devices=cpu_devices[:4])
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 10, 8))
    vs = m.init({"params": jax.random.key(0)}, x, True)

    from vision_transformers_torch_xla_tpu.train.losses import cross_entropy

    def loss_fn(params, xx, yy):
        return cross_entropy(m.apply({"params": params}, xx, True), yy)

    params = nn.meta.unbox(vs["params"])
    l_single = float(loss_fn(params, x, labels))
    xsh = NamedSharding(mesh, P("data"))
    l_sharded = float(jax.jit(loss_fn)(
        jax.device_put(params, NamedSharding(mesh, P())),
        jax.device_put(x, xsh),
        jax.device_put(labels, NamedSharding(mesh, P("data")))))
    np.testing.assert_allclose(l_single, l_sharded, rtol=2e-5)
