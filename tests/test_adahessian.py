"""AdaHessian: Hutchinson estimator + optimizer chain + e2e train step.

The reference reaches this path via timm's Adahessian and the
``is_second_order``/``create_graph`` probe (reference optim_factory.py:264-265,
engine.py:247-250); here the Hessian-vector product is a forward-over-reverse
jvp (train/adahessian.py) fed to the optax chain as an extra arg.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_transformers_torch_xla_tpu.train.adahessian import (
    adahessian,
    hutchinson_diag,
    rademacher_like,
)
from vision_transformers_torch_xla_tpu.train.optim import (
    create_optimizer,
    is_second_order,
)


def test_hutchinson_exact_on_diagonal_hessian():
    # L = 0.5 sum(a w^2): H = diag(a); z * Hz = a z^2 = a for any Rademacher z
    a = jnp.array([1.0, 4.0, 9.0, 0.25])
    loss = lambda p: 0.5 * jnp.sum(a * p["w"] ** 2)
    d = hutchinson_diag(jax.grad(loss), {"w": jnp.ones(4)},
                        jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(d["w"]), np.asarray(a), rtol=1e-6)


def test_hutchinson_unbiased_on_dense_hessian():
    # Dense symmetric H: single samples are noisy but the mean converges to
    # diag(H).
    h = jnp.array([[2.0, 0.5, -0.3],
                   [0.5, 1.0, 0.2],
                   [-0.3, 0.2, 3.0]])
    loss = lambda p: 0.5 * p["w"] @ h @ p["w"]
    w = {"w": jnp.zeros(3)}
    grad_fn = jax.grad(loss)
    keys = jax.random.split(jax.random.PRNGKey(1), 256)
    est = np.mean([np.asarray(hutchinson_diag(grad_fn, w, k)["w"])
                   for k in keys], axis=0)
    np.testing.assert_allclose(est, np.diag(np.asarray(h)), atol=0.15)


def test_conv_kernel_spatial_averaging():
    # ndim==4 (HWIO) leaves are averaged over the spatial axes and broadcast
    # back; other ranks untouched.
    k = jnp.arange(2 * 2 * 1 * 1, dtype=jnp.float32).reshape(2, 2, 1, 1)
    loss = lambda p: 0.5 * jnp.sum(jnp.arange(4.0).reshape(2, 2, 1, 1)
                                   * p["k"] ** 2)
    d = hutchinson_diag(jax.grad(loss), {"k": k}, jax.random.PRNGKey(2),
                        avg_conv_kernel=True)
    # exact diagonal is [0,1,2,3]; spatial mean = 1.5 everywhere
    np.testing.assert_allclose(np.asarray(d["k"]).ravel(), [1.5] * 4,
                               rtol=1e-6)
    d = hutchinson_diag(jax.grad(loss), {"k": k}, jax.random.PRNGKey(2),
                        avg_conv_kernel=False)
    np.testing.assert_allclose(np.asarray(d["k"]).ravel(), [0, 1, 2, 3],
                               atol=1e-6)


def test_rademacher_values():
    z = rademacher_like(jax.random.PRNGKey(3), {"a": jnp.zeros(100)})
    assert set(np.unique(np.asarray(z["a"]))) <= {-1.0, 1.0}


def test_single_step_matches_hand_computation():
    # First step: mhat = g, vhat = D^2, precond = g/(|D|+eps); plus decoupled
    # wd, times -lr.
    a = jnp.array([1.0, 4.0, 9.0])
    w = {"w": jnp.ones(3)}
    loss = lambda p: 0.5 * jnp.sum(a * p["w"] ** 2)
    g = jax.grad(loss)(w)
    d = hutchinson_diag(jax.grad(loss), w, jax.random.PRNGKey(0))
    tx = adahessian(0.1, weight_decay=0.05)
    s = tx.init(w)
    u, _ = tx.update(g, s, w, hessian_diag=d)
    expect = -0.1 * (np.asarray(a) / (np.asarray(a) + 1e-8) + 0.05)
    np.testing.assert_allclose(np.asarray(u["w"]), expect, rtol=1e-5)


def test_hessian_power_halves_exponent():
    a = jnp.array([4.0])
    w = {"w": jnp.ones(1)}
    loss = lambda p: 0.5 * jnp.sum(a * p["w"] ** 2)
    g = jax.grad(loss)(w)
    d = hutchinson_diag(jax.grad(loss), w, jax.random.PRNGKey(0))
    tx = adahessian(1.0, hessian_power=0.5)
    u, _ = tx.update(g, tx.init(w), w, hessian_diag=d)
    # vhat = D^2 = 16; denom = 16^(k/2) = 16^0.25 = 2; update = -4/2
    np.testing.assert_allclose(np.asarray(u["w"]), [-2.0], rtol=1e-4)


def test_is_second_order():
    assert is_second_order("adahessian")
    assert is_second_order("lookahead_adahessian")
    assert not is_second_order("adamw")


@pytest.mark.parametrize("opt", ["adahessian", "lookahead_adahessian"])
def test_factory_chain_converges_on_quadratic(opt):
    # create_optimizer chains clip -> adahessian; extra args must flow
    # through the whole chain (incl. the lookahead wrapper).
    a = jnp.array([1.0, 10.0, 100.0])
    w = {"w": jnp.array([1.0, 1.0, 1.0])}
    loss = lambda p: 0.5 * jnp.sum(a * p["w"] ** 2)
    # clip threshold above the ~100 grad norm: it stays a chain member (so
    # extra-arg forwarding is exercised) without shrinking the numerator
    # relative to the unclipped Hessian denominator
    tx = create_optimizer(opt, 0.1, w, weight_decay=0.0, clip_grad=500.0)
    s = tx.init(w)
    grad_fn = jax.grad(loss)

    @jax.jit
    def step(w, s, k):
        g = grad_fn(w)
        d = hutchinson_diag(grad_fn, w, k)
        u, s = tx.update(g, s, w, hessian_diag=d)
        return optax.apply_updates(w, u), s

    keys = jax.random.split(jax.random.PRNGKey(4), 60)
    for k in keys:
        w, s = step(w, s, k)
    # the Hessian preconditioner equalizes convergence across the 100x
    # curvature spread — all coordinates should be near zero together
    assert float(loss(w)) < 1e-2 * float(loss({"w": jnp.ones(3)}))


def test_train_step_second_order_e2e():
    from vision_transformers_torch_xla_tpu.models.factory import create_model
    from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
    from vision_transformers_torch_xla_tpu.train.state import create_train_state
    from vision_transformers_torch_xla_tpu.train.steps import (
        StepConfig,
        make_train_step,
    )

    m = create_model("my_vit_ti", num_classes=10, img_size=32, depth=2,
                     embed_dim=64, num_heads=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])
    from flax import linen as nn

    params = nn.meta.unbox(m.init(jax.random.PRNGKey(1), x, True))["params"]
    tx = create_optimizer("adahessian", 1e-3, params, weight_decay=0.01)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        m.apply, tx,
        StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0),
                   num_classes=10),
        second_order=True))
    rng = jax.random.PRNGKey(2)
    losses = []
    for _ in range(4):
        state, metrics = step(state, x, y, rng)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
