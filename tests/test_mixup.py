"""Device-side mixup/cutmix tests (semantics of timm.data.Mixup 'batch' mode,
applied host-side in the reference at engine.py:132-133)."""
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.train.mixup import (
    MixupConfig,
    mixup_cutmix,
    smoothed_one_hot,
)


def _batch(n=8, hw=16, c=10, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.normal(size=(n, hw, hw, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, c, n))
    return images, labels


def test_smoothed_one_hot_values():
    t = smoothed_one_hot(jnp.array([2]), 5, 0.1)
    np.testing.assert_allclose(float(t[0, 2]), 1 - 0.1 + 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(t[0, 0]), 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(t.sum()), 1.0, rtol=1e-6)


def test_disabled_returns_smoothed_onehot():
    images, labels = _batch()
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0, num_classes=10)
    out_im, out_t = mixup_cutmix(jax.random.key(0), images, labels, cfg)
    assert (out_im == images).all()
    np.testing.assert_allclose(np.asarray(out_t),
                               np.asarray(smoothed_one_hot(labels, 10, 0.1)))


def test_targets_are_distributions():
    images, labels = _batch()
    cfg = MixupConfig(num_classes=10)
    for seed in range(5):
        _, t = mixup_cutmix(jax.random.key(seed), images, labels, cfg)
        np.testing.assert_allclose(np.asarray(t.sum(-1)), np.ones(8), rtol=1e-5)


def test_mixup_images_are_convex_combination():
    images, labels = _batch()
    cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0, num_classes=10)
    mixed, t = mixup_cutmix(jax.random.key(1), images, labels, cfg)
    # mixed = lam*x + (1-lam)*flip(x): recover lam from targets, verify images
    flipped = images[::-1]
    a = np.asarray(mixed - flipped)
    b = np.asarray(images - flipped)
    mask = np.abs(b) > 1e-3
    lam_est = (a[mask] / b[mask])
    assert lam_est.std() < 1e-3  # single lambda for the whole batch
    lam = lam_est.mean()
    assert 0.0 <= lam <= 1.0


def test_cutmix_pastes_box():
    images, labels = _batch()
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, prob=1.0, num_classes=10)
    mixed, t = mixup_cutmix(jax.random.key(3), images, labels, cfg)
    m = np.asarray(mixed)
    im = np.asarray(images)
    fl = np.asarray(images[::-1])
    # every pixel comes from either the original or the flipped batch
    from_orig = np.isclose(m, im).all(-1)
    from_flip = np.isclose(m, fl).all(-1)
    assert (from_orig | from_flip).all()


def test_jit_traceable():
    images, labels = _batch()
    cfg = MixupConfig(num_classes=10)
    f = jax.jit(lambda k: mixup_cutmix(k, images, labels, cfg))
    im, t = f(jax.random.key(0))
    assert im.shape == images.shape and t.shape == (8, 10)
