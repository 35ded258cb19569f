"""Gradient-accumulation equivalence + checkpoint rotation tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step


def test_accumulation_matches_full_batch(tiny_model_kwargs):
    """2 microsteps at update_freq=2 == 1 step on the concatenated batch
    (the --update_freq semantics, reference engine.py:164-190)."""
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    ya = jnp.asarray(rng.integers(0, 10, 4))
    yb = jnp.asarray(rng.integers(0, 10, 4))
    params = nn.meta.unbox(m.init({"params": jax.random.key(0)}, xa, True))["params"]
    cfg = StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                                       num_classes=10), num_classes=10)

    # accumulated: two half batches (sgd so state is linear in grads)
    tx2 = create_optimizer("sgd", 0.1, params, momentum=0.0, update_freq=2)
    step2 = jax.jit(make_train_step(m.apply, tx2, cfg))
    s2 = create_train_state(params, tx2)
    s2, _ = step2(s2, xa, ya, jax.random.key(1))
    s2, _ = step2(s2, xb, yb, jax.random.key(1))

    # full batch
    tx1 = create_optimizer("sgd", 0.1, params, momentum=0.0)
    step1 = jax.jit(make_train_step(m.apply, tx1, cfg))
    s1 = create_train_state(params, tx1)
    s1, _ = step1(s1, jnp.concatenate([xa, xb]), jnp.concatenate([ya, yb]),
                  jax.random.key(1))

    w2 = s2.params["head"]["kernel"]
    w1 = s1.params["head"]["kernel"]
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1),
                               rtol=2e-4, atol=1e-6)


def test_ckpt_rotation(tmp_path, tiny_model_kwargs):
    """max_to_keep rotation (reference save_ckpt_num semantics,
    utils/__init__.py:728-732)."""
    from vision_transformers_torch_xla_tpu.ckpt.checkpoint import CheckpointManager

    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = nn.meta.unbox(m.init({"params": jax.random.key(0)}, x, True))["params"]
    tx = create_optimizer("sgd", 0.1, params)
    state = create_train_state(params, tx)

    mngr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    for epoch in range(5):
        mngr.save(epoch, state, metadata={"epoch": epoch})
    mngr.wait()
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit())
    assert kept == [3, 4]
    restored, meta = mngr.restore(state)
    assert meta["epoch"] == 4
    mngr.close()
