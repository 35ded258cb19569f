"""KD end-to-end test (the rebuild's version of reference test_kd.py:18-129:
student+teacher built via the factory, train path returns a KD-influenced
loss, eval path uses the student alone)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step


@pytest.fixture(scope="module")
def kd_setup(tiny_model_kwargs):
    student = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    teacher = VisionTransformer(**{**tiny_model_kwargs, "embed_dim": 96, "num_heads": 3}, dtype=jnp.float32)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    s_params = nn.meta.unbox(student.init({"params": jax.random.key(0)}, x, True))["params"]
    t_params = nn.meta.unbox(teacher.init({"params": jax.random.key(1)}, x, True))["params"]
    return student, teacher, s_params, t_params


def test_kd_train_step_runs_and_differs(kd_setup):
    student, teacher, s_params, t_params = kd_setup
    tx = create_optimizer("adamw", 1e-3, s_params)
    cfg = StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                                       num_classes=10),
                     num_classes=10, kd_alpha=0.5, kd_temperature=4.0)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 4))
    key = jax.random.key(0)

    plain = make_train_step(student.apply, tx, cfg)
    kd = make_train_step(student.apply, tx, cfg, teacher_apply=teacher.apply)

    state1 = create_train_state(s_params, tx)
    _, m_plain = jax.jit(plain)(state1, images, labels, key)
    state2 = create_train_state(s_params, tx)
    _, m_kd = jax.jit(kd)(state2, images, labels, key, t_params)

    assert np.isfinite(float(m_kd["loss"]))
    # KD adds the T^2-scaled KL term: losses must differ
    assert abs(float(m_kd["loss"]) - float(m_plain["loss"])) > 1e-4


def test_kd_alpha_zero_matches_plain(kd_setup):
    student, teacher, s_params, t_params = kd_setup
    tx = create_optimizer("adamw", 1e-3, s_params)
    cfg0 = StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                                        num_classes=10),
                      num_classes=10, kd_alpha=0.0, kd_temperature=4.0)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 4))
    key = jax.random.key(0)
    plain = make_train_step(student.apply, tx, cfg0)
    kd = make_train_step(student.apply, tx, cfg0, teacher_apply=teacher.apply)
    _, m1 = jax.jit(plain)(create_train_state(s_params, tx), images, labels, key)
    _, m2 = jax.jit(kd)(create_train_state(s_params, tx), images, labels, key, t_params)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
