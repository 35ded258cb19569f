"""Device-RandAugment policy anchored to timm's grammar (VERDICT r5 task 8).

test_device_aug.py proves shape/range/determinism; these tests pin the
POLICY: the 15-op set of timm's 'rand-*' auto_augment policy, the
level/_LEVEL_DENOM(=10) magnitude->parameter mapping per op (inc1 curves),
the 0.5 apply-probability, uniform op selection, and fixed-parameter
geometric goldens diffed against PIL. A wrong magnitude mapping or op
weighting fails here (the pre-r5 /30 normalization — 3x-too-weak aug —
would fail test_magnitude_grammar immediately).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.data.device_aug import (
    RA_OP_NAMES,
    _RA_OPS,
    _equalize,
    _posterize,
    _rotate_batch,
    _shear_x_batch,
    _solarize,
    _solarize_add,
    _translate_x_batch,
    rand_augment_batch,
    sample_ra_layer,
)

# timm auto_augment.py rand_augment_ops default transforms
TIMM_RAND_POLICY = {
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateXRel", "TranslateYRel",
}


def _smooth_image(hw=64, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32)
    # separable box blur keeps bilinear-resampling diffs small
    k = np.ones(7) / 7
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda v: np.convolve(v, k, mode="same"), ax, img)
    return img.astype(np.float32)


def test_op_set_matches_timm_rand_policy():
    assert set(RA_OP_NAMES) == TIMM_RAND_POLICY
    assert len(_RA_OPS) == len(RA_OP_NAMES) == 15


def test_layer_sampling_distribution():
    """apply-prob 0.5, uniform op choice, symmetric sign, level/10 scaling."""
    keys = jax.random.split(jax.random.key(0), 6000)
    idx, mag = jax.vmap(lambda k: sample_ra_layer(k, 9.0, 0.5, 15))(keys)
    idx, mag = np.asarray(idx), np.asarray(mag)
    ident = (idx == 15).mean()
    assert 0.46 < ident < 0.54, f"apply-prob drifted: identity frac {ident}"
    freq = np.bincount(idx[idx < 15], minlength=15) / (idx < 15).sum()
    assert freq.min() > 0.5 / 15 and freq.max() < 1.6 / 15, freq
    assert abs(np.sign(mag).mean()) < 0.05  # _randomly_negate
    # level ~ clip(N(9, 0.5), 0, 10)/10
    assert abs(np.abs(mag).mean() - 0.9) < 0.01
    assert np.abs(mag).max() <= 1.0 + 1e-6


def test_magnitude_grammar():
    """m9/mstd0 -> level 0.9; the per-op parameter curves are timm's."""
    idx, mag = sample_ra_layer(jax.random.key(3), 9.0, 0.0, 15,
                               apply_prob=1.0)
    assert abs(abs(float(mag)) - 0.9) < 1e-6
    # rotate: level*30 deg; translate: level*0.45 of width (timm
    # _rotate_level_to_arg / translate_pct). Verify via content motion.
    img = np.zeros((64, 64, 1), np.float32)
    img[31:33, 47:49] = 1.0  # spike at (32, 48): r=16 px from center
    out = np.asarray(_translate_x_batch(jnp.asarray(img[None]),
                                        jnp.asarray(0.9 * 0.45)))[0]
    y, x = np.unravel_index(out[..., 0].argmax(), out[..., 0].shape)
    assert abs(x - (48 - round(0.9 * 0.45 * 64))) <= 1, (y, x)
    out = np.asarray(_rotate_batch(jnp.asarray(img[None]),
                                   jnp.asarray(0.9 * np.pi / 6)))[0]
    y, x = np.unravel_index(out[..., 0].argmax(), out[..., 0].shape)
    # spike at angle 0 from center rotates by -27deg (content clockwise)
    a = np.deg2rad(-27)
    wy, wx = 31.5 + 16.5 * np.sin(-a), 31.5 + 16.5 * np.cos(a)
    assert abs(y - wy) <= 1.5 and abs(x - wx) <= 1.5, ((y, x), (wy, wx))


def test_rotation_golden_vs_pil():
    PIL = pytest.importorskip("PIL.Image")
    img = _smooth_image()
    a = 27.0
    mine = np.asarray(_rotate_batch(jnp.asarray(img[None]),
                                    jnp.asarray(np.deg2rad(a))))[0]
    pil = PIL.fromarray((img * 255).astype(np.uint8))
    ref = np.asarray(pil.rotate(-a, resample=PIL.BILINEAR),
                     np.float32) / 255.0
    c = slice(20, 44)  # interior: border fill conventions differ
    mad = np.abs(mine - ref)[c, c].mean()
    assert mad < 0.01, f"rotate diverges from PIL golden: interior MAD {mad}"


def test_shear_golden_vs_pil():
    PIL = pytest.importorskip("PIL.Image")
    img = _smooth_image(seed=1)
    s = 0.27  # m9 shear: level 0.9 * 0.3
    mine = np.asarray(_shear_x_batch(jnp.asarray(img[None]),
                                     jnp.asarray(s)))[0]
    # PIL affine with the same center-anchored source map:
    # src_x = x + s*(y - cy) -> c term = -s*cy
    pil = PIL.fromarray((img * 255).astype(np.uint8))
    cy = (img.shape[0] - 1) / 2
    ref = np.asarray(
        pil.transform(pil.size, PIL.AFFINE, (1, s, -s * cy, 0, 1, 0),
                      resample=PIL.BILINEAR), np.float32) / 255.0
    c = slice(20, 44)
    mad = np.abs(mine - ref)[c, c].mean()
    assert mad < 0.01, f"shear diverges from PIL golden: interior MAD {mad}"


def test_posterize_inc1_curve():
    """m9 -> keep 4 - int(0.9*4) = 1 bit: outputs quantize to {0, 0.5}."""
    img = jnp.asarray(_smooth_image())
    out = np.asarray(_posterize(img, 0.9))
    assert set(np.round(np.unique(out), 6)) <= {0.0, 0.5}
    # m2 -> 4 - int(0.2*4) = 4 bits -> 16 levels
    out = np.asarray(_posterize(img, 0.2))
    assert np.allclose(out * 16, np.round(out * 16), atol=1e-5)


def test_solarize_curves():
    img = jnp.asarray(_smooth_image())
    # SolarizeIncreasing: threshold 1 - level (m9 -> 0.1)
    out = np.asarray(_solarize(img, 0.9))
    inp = np.asarray(img)
    np.testing.assert_allclose(out[inp < 0.1], inp[inp < 0.1])
    np.testing.assert_allclose(out[inp >= 0.1], 1 - inp[inp >= 0.1])
    # SolarizeAdd: +int(level*110)/255 below the fixed 0.5 threshold
    out = np.asarray(_solarize_add(img, 0.9))
    lo = inp < 0.5
    np.testing.assert_allclose(out[lo], np.clip(inp[lo] + 0.9 * 110 / 255, 0, 1),
                               atol=1e-6)
    np.testing.assert_allclose(out[~lo], inp[~lo])


def test_equalize_flattens_and_matches_tf_lut():
    """Skewed histogram -> near-uniform; identity on constant images."""
    rng = np.random.default_rng(0)
    img = (rng.beta(5, 1.5, (64, 64, 3)) ** 2).astype(np.float32)
    out = np.asarray(_equalize(jnp.asarray(img), 0.0))
    hist_in, _ = np.histogram(img, bins=8, range=(0, 1))
    hist_out, _ = np.histogram(out, bins=8, range=(0, 1))
    assert hist_out.std() < hist_in.std() * 0.35, (hist_in, hist_out)
    # exact LUT parity with the TF-EfficientNet reference construction
    # (the algorithm timm's tf-style RandAugment and data/pp_ops.py use)
    q = np.clip(np.floor(img * 255.0 + 0.5), 0, 255).astype(np.int64)
    want = np.empty_like(q, dtype=np.float64)
    for c in range(3):
        h = np.bincount(q[..., c].ravel(), minlength=256)
        step = (h.sum() - h[255]) // 255
        if step == 0:
            want[..., c] = q[..., c]
        else:
            lut = (np.cumsum(h) + step // 2) // step
            lut = np.clip(np.concatenate([[0], lut[:-1]]), 0, 255)
            want[..., c] = lut[q[..., c]]
    np.testing.assert_allclose(out, want / 255.0, atol=1e-6)


def test_batch_pipeline_with_new_ops_jits():
    x = jnp.asarray(_smooth_image(32)[None].repeat(4, 0))
    f = jax.jit(lambda k, im: rand_augment_batch(k, im, 2, 9.0, 0.5))
    for i in range(4):
        y = f(jax.random.key(i), x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())
