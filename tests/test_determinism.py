"""Reproducibility: identical seeds -> identical training trajectories."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step


def _run(seed, tiny_model_kwargs, steps=3):
    m = VisionTransformer(**tiny_model_kwargs, drop_path_rate=0.1,
                          dtype=jnp.float32)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, 4))
    params = nn.meta.unbox(
        m.init({"params": jax.random.key(seed)}, x, True))["params"]
    tx = create_optimizer("adamw", 1e-3, params)
    state = create_train_state(params, tx, with_ema=True)
    cfg = StepConfig(mixup=MixupConfig(num_classes=10), num_classes=10,
                     ema_decay=0.99)
    step = jax.jit(make_train_step(m.apply, tx, cfg))
    losses = []
    for _ in range(steps):
        state, metrics = step(state, x, y, jax.random.key(seed))
        losses.append(float(metrics["loss"]))
    return losses


def test_same_seed_same_trajectory(tiny_model_kwargs):
    a = _run(0, tiny_model_kwargs)
    b = _run(0, tiny_model_kwargs)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_different_seed_differs(tiny_model_kwargs):
    a = _run(0, tiny_model_kwargs)
    c = _run(1, tiny_model_kwargs)
    assert a != c
