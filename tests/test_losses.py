"""Loss parity tests: label smoothing, soft targets, KD formula
(reference main.py:926-970)."""
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.train.losses import (
    cross_entropy,
    distillation_loss,
    soft_target_cross_entropy,
    topk_correct,
)
from vision_transformers_torch_xla_tpu.train.mixup import smoothed_one_hot


def test_ce_matches_manual():
    logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 3.0, 0.0]])
    labels = jnp.array([0, 1])
    got = float(cross_entropy(logits, labels))
    p = np.exp(np.asarray(logits))
    p = p / p.sum(-1, keepdims=True)
    want = -np.mean([np.log(p[0, 0]), np.log(p[1, 1])])
    np.testing.assert_allclose(got, want, rtol=3e-4)


def test_smoothing_equals_soft_target_path():
    """LabelSmoothingCE(int labels) == SoftTargetCE(smoothed one-hot)."""
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, 10)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 8))
    a = float(cross_entropy(logits, labels, smoothing=0.1))
    soft = smoothed_one_hot(labels, 10, 0.1)
    b = float(soft_target_cross_entropy(logits, soft))
    np.testing.assert_allclose(a, b, rtol=3e-4)


def test_kd_formula():
    """(1-a)*base + a*T^2*KL — reference main.py:947-965."""
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(4, 7)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 7)), jnp.float32)
    base = jnp.asarray(1.7)
    alpha, temp = 0.5, 4.0
    got = float(distillation_loss(s, t, base, alpha, temp))

    ls = jax.nn.log_softmax(s / temp, -1)
    pt = jax.nn.softmax(t / temp, -1)
    kl = float((pt * (jnp.log(pt) - ls)).sum(-1).mean())
    want = (1 - alpha) * 1.7 + alpha * temp * temp * kl
    np.testing.assert_allclose(got, want, rtol=3e-4)


def test_kd_zero_alpha_is_base():
    s = jnp.ones((2, 5))
    t = jnp.zeros((2, 5))
    assert float(distillation_loss(s, t, jnp.asarray(2.0), 0.0, 4.0)) == 2.0


def test_topk_correct():
    logits = jnp.array([[0.1, 0.9, 0.0, 0.0, 0.0, 0.0],
                        [0.9, 0.1, 0.0, 0.0, 0.0, 0.0]])
    labels = jnp.array([1, 3])
    m = topk_correct(logits, labels, ks=(1, 5))
    assert int(m["top1"]) == 1
    assert int(m["top5"]) == 2
    assert int(m["count"]) == 2
