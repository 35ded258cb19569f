"""ResNet + BatchNorm (mutable model_state) end-to-end tests."""
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.models.resnet import ResNet
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import (
    StepConfig,
    make_eval_step,
    make_train_step,
)


def _tiny_resnet():
    return ResNet(stage_sizes=(1, 1), width=8, num_classes=10,
                  dtype=jnp.float32)


def test_resnet_forward():
    m = _tiny_resnet()
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = m.init({"params": jax.random.key(0)}, x, True)
    assert "batch_stats" in variables
    y = m.apply(variables, x, True)
    assert y.shape == (2, 10)


def test_bn_train_step_updates_stats():
    m = _tiny_resnet()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 10, 4))
    variables = m.init({"params": jax.random.key(0)}, x, True)
    params = variables["params"]
    mstate = {"batch_stats": variables["batch_stats"]}
    tx = create_optimizer("sgd", 1e-2, params)
    state = create_train_state(params, tx, model_state=mstate)
    cfg = StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                                       num_classes=10), num_classes=10)
    step = jax.jit(make_train_step(m.apply, tx, cfg,
                                   mutable_collections=("batch_stats",)))
    new_state, metrics = step(state, x, labels, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    old_mean = jax.tree.leaves(state.model_state["batch_stats"])[0]
    new_mean = jax.tree.leaves(new_state.model_state["batch_stats"])[0]
    assert not np.allclose(np.asarray(old_mean), np.asarray(new_mean))

    # eval uses running stats
    eval_step = jax.jit(make_eval_step(m.apply,
                                       mutable_collections=("batch_stats",)))
    metrics = eval_step(new_state.params, x, labels, new_state.model_state)
    assert int(metrics["count"]) == 4
