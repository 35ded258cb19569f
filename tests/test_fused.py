"""Fused AdamW+EMA (train/fused.py) must match the optax path bit-for-bit
in fp32: same moments, same decoupled-wd masking, same bias correction,
same EMA blend, same grad-norm metric, with and without clipping."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_transformers_torch_xla_tpu.train.fused import make_fused_adamw
from vision_transformers_torch_xla_tpu.train.optim import (
    create_optimizer,
    maybe_fused_optimizer,
    wd_mask,
)
from vision_transformers_torch_xla_tpu.train.state import ema_update


def _params(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "blocks_0": {"kernel": jnp.asarray(rng.normal(size=(8, 16)),
                                           jnp.float32),
                     "bias": jnp.asarray(rng.normal(size=(16,)),
                                         jnp.float32)},
        "pos_embed": jnp.asarray(rng.normal(size=(1, 5, 8)), jnp.float32),
        "head": {"kernel": jnp.asarray(rng.normal(size=(8, 4)),
                                       jnp.float32)},
    }


def _grads(seed):
    return jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(seed).normal(size=p.shape), jnp.float32),
        _params())


@pytest.mark.parametrize("clip", [None, 0.5])
def test_fused_matches_optax(clip):
    lr_fn = optax.cosine_decay_schedule(1e-3, 100)
    params = _params()
    wd = 0.05
    mask = wd_mask(params)

    chain = [optax.clip_by_global_norm(clip)] if clip else []
    chain.append(optax.adamw(lr_fn, weight_decay=wd, mask=lambda p: mask))
    ref_tx = optax.chain(*chain) if len(chain) > 1 else chain[0]
    fused = make_fused_adamw(lr_fn, weight_decay=wd, ema_decay=0.99,
                             clip_grad=clip, mask=mask)

    ref_p, ref_st = params, ref_tx.init(params)
    ref_ema = jax.tree.map(lambda p: p + 0, params)
    f_p, f_st = params, fused.init(params)
    f_ema = jax.tree.map(lambda p: p + 0, params)

    for step in range(5):
        g = _grads(step)
        upd, ref_st = ref_tx.update(g, ref_st, ref_p)
        ref_p = optax.apply_updates(ref_p, upd)
        ref_ema = ema_update(ref_ema, ref_p, 0.99)
        ref_norm = optax.global_norm(g)

        f_p, f_st, f_ema, f_norm = fused.fused_update(g, f_st, f_p, f_ema)

        np.testing.assert_allclose(f_norm, ref_norm, rtol=1e-6)
        for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(f_p)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)
        for a, b in zip(jax.tree.leaves(ref_ema), jax.tree.leaves(f_ema)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)


def test_fused_no_ema_path():
    fused = make_fused_adamw(1e-3, weight_decay=0.0)
    params = _params()
    st = fused.init(params)
    p, st, ema, norm = fused.fused_update(_grads(0), st, params, None)
    assert ema is None
    assert int(st.count) == 1
    assert float(norm) > 0


def test_maybe_fused_eligibility():
    params = _params()
    assert maybe_fused_optimizer("adamw", 1e-3, params) is not None
    assert maybe_fused_optimizer("fusedadamw", 1e-3, params) is not None
    assert maybe_fused_optimizer("sgd", 1e-3, params) is None
    assert maybe_fused_optimizer("adamw", 1e-3, params,
                                 layer_decay=0.75) is None
    assert maybe_fused_optimizer("adamw", 1e-3, params,
                                 update_freq=2) is None
    assert maybe_fused_optimizer(
        "adamw", 1e-3, params,
        weight_decay_schedule=lambda s: 0.05) is None


def test_fused_in_train_step():
    """End-to-end: make_train_step dispatches on the fused optimizer and
    matches the optax path over 3 steps on a tiny model."""
    from flax import linen as nn

    from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
    from vision_transformers_torch_xla_tpu.train.state import (
        create_train_state,
    )
    from vision_transformers_torch_xla_tpu.train.steps import (
        StepConfig,
        make_train_step,
    )

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, deterministic=True, rngs=None):
            x = x.reshape((x.shape[0], -1))
            return nn.Dense(10)(x)

    model = M()
    x = jnp.ones((4, 8, 8, 3))
    y = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.key(0), x)["params"]
    apply = lambda v, im, det, rngs=None: model.apply(v, im, det)  # noqa: E731

    cfg = StepConfig(mixup=MixupConfig(num_classes=10, mixup_alpha=0.0,
                                       cutmix_alpha=0.0, prob=0.0),
                     num_classes=10, ema_decay=0.99, lr_schedule=None)

    opt_tx = create_optimizer("adamw", 1e-3, params, weight_decay=0.05)
    fused = maybe_fused_optimizer("adamw", 1e-3, params, weight_decay=0.05,
                                  ema_decay=0.99)

    s_ref = create_train_state(params, opt_tx, with_ema=True)
    s_fused = create_train_state(params, fused, with_ema=True)
    step_ref = jax.jit(make_train_step(apply, opt_tx, cfg))
    step_fused = jax.jit(make_train_step(apply, fused, cfg))

    key = jax.random.key(1)
    for _ in range(3):
        s_ref, m_ref = step_ref(s_ref, x, y, key)
        s_fused, m_fused = step_fused(s_fused, x, y, key)
    np.testing.assert_allclose(m_fused["loss"], m_ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(m_fused["grad_norm"], m_ref["grad_norm"],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_fused.params)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s_ref.ema_params),
                    jax.tree.leaves(s_fused.ema_params)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
