"""On-device augmentation tests (data/device_aug.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.data.device_aug import (
    DeviceAugConfig,
    _autocontrast,
    _brightness,
    _invert,
    _posterize,
    _rotate,
    _solarize,
    augment_batch,
    rand_augment,
    random_resized_crop,
)


def _img(h=64, w=64, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random((h, w, 3)),
                       jnp.float32)


def test_rrc_shape_and_range():
    out = random_resized_crop(jax.random.key(0), _img(100, 80), 32)
    assert out.shape == (32, 32, 3)
    assert float(out.min()) >= -1e-3 and float(out.max()) <= 1.0 + 1e-3


def test_rrc_full_crop_is_resize():
    """area=1, ratio=1 crop reproduces a plain resize."""
    img = _img(64, 64, 1)
    out = random_resized_crop(jax.random.key(0), img, 64,
                              area_range=(1.0, 1.0), ratio_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_photometric_ops():
    img = _img()
    assert float(jnp.abs(_invert(img, 0.5) - (1 - img)).max()) < 1e-6
    np.testing.assert_allclose(np.asarray(_brightness(img, 0.0)),
                               np.asarray(img), atol=1e-6)
    sol = _solarize(img, 0.999)  # threshold ~0.001: almost everything inverts
    mask = np.asarray(img) >= 0.001
    np.testing.assert_allclose(np.asarray(sol)[mask],
                               np.asarray(1 - img)[mask], atol=1e-5)
    post = _posterize(img, 1.0)  # 4 bits
    assert len(np.unique(np.asarray(post))) <= 16 * 3 + 1
    ac = _autocontrast(img, 0.0)
    assert float(ac.min()) < 1e-5 and float(ac.max()) > 1 - 1e-5


def test_rotate_zero_is_identity():
    img = _img()
    out = _rotate(img, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_rand_augment_jits_and_varies():
    img = _img()
    f = jax.jit(lambda k: rand_augment(k, img))
    a = f(jax.random.key(0))
    b = f(jax.random.key(1))
    assert a.shape == img.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # deterministic per key
    np.testing.assert_allclose(np.asarray(a), np.asarray(f(jax.random.key(0))))


def test_augment_batch_normalizes():
    cfg = DeviceAugConfig(out_size=32, randaug_layers=2)
    images = jnp.asarray(np.random.default_rng(0).random((4, 48, 48, 3)),
                         jnp.float32)
    out = jax.jit(lambda k: augment_batch(k, images, cfg))(jax.random.key(0))
    assert out.shape == (4, 32, 32, 3)
    # normalized stats: roughly centered
    assert abs(float(out.mean())) < 2.0
    # per-image randomness differs
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_random_erase():
    from vision_transformers_torch_xla_tpu.data.device_aug import random_erase

    img = jnp.zeros((32, 32, 3), jnp.float32)
    out = random_erase(jax.random.key(3), img, prob=1.0)
    changed = np.asarray(out != 0).any(axis=-1)
    assert changed.any() and not changed.all()  # a box, not everything
    # prob 0: untouched
    out0 = random_erase(jax.random.key(3), img, prob=0.0)
    np.testing.assert_allclose(np.asarray(out0), 0.0)


def test_augment_batch_with_erase():
    cfg = DeviceAugConfig(out_size=32, randaug_layers=0, reprob=1.0)
    images = jnp.asarray(np.random.default_rng(0).random((2, 48, 48, 3)),
                         jnp.float32)
    out = jax.jit(lambda k: augment_batch(k, images, cfg))(jax.random.key(0))
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_color_jitter_bounds_and_variability():
    from vision_transformers_torch_xla_tpu.data.device_aug import color_jitter

    img = jnp.asarray(np.random.default_rng(5).random((16, 16, 3)), jnp.float32)
    a = color_jitter(jax.random.key(0), img, 0.4)
    b = color_jitter(jax.random.key(1), img, 0.4)
    assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # zero strength: identity
    c = color_jitter(jax.random.key(2), img, 0.0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(img), atol=1e-6)


def test_batched_geom_matches_per_image():
    """Separable-matmul warps (batch path) vs the per-image gather warps:
    shear/translate are exactly the same bilinear map (one pass each);
    rotation is a 3-shear decomposition whose interior agrees to interp
    tolerance."""
    from vision_transformers_torch_xla_tpu.data.device_aug import (
        _RA_BATCH_GEOM,
        _shear_x,
        _shear_y,
        _translate_x,
        _translate_y,
        _rotate_batch,
    )

    imgs = jnp.asarray(np.random.default_rng(7).random((2, 24, 24, 3)),
                       jnp.float32)
    mag = 0.5
    for f in (_shear_x, _shear_y, _translate_x, _translate_y):
        got = _RA_BATCH_GEOM[f](imgs, mag)
        want = jax.vmap(lambda im: f(im, mag))(imgs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, err_msg=f.__name__)
    # rotation on a SMOOTH image (random noise measures interp scheme
    # differences, not correctness): interiors agree to interp tolerance
    yy, xx = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    smooth = (np.sin(yy / 6.0) + np.cos(xx / 5.0) + 2) / 4.0
    smooth = jnp.asarray(np.stack([smooth] * 3, -1), jnp.float32)[None]
    a = 0.3
    got = _rotate_batch(smooth, jnp.float32(a))
    want = jax.vmap(lambda im: _rotate(im, a * 6 / np.pi))(smooth)
    c = 6  # trim border (the 3-pass corners clip differently)
    diff = np.abs(np.asarray(got) - np.asarray(want))[:, c:-c, c:-c]
    assert diff.mean() < 5e-3 and diff.max() < 3e-2


def test_rotate_batch_zero_is_identity():
    from vision_transformers_torch_xla_tpu.data.device_aug import (
        _rotate_batch,
    )

    imgs = jnp.asarray(np.random.default_rng(8).random((2, 16, 16, 3)),
                       jnp.float32)
    out = _rotate_batch(imgs, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)
