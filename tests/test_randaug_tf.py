"""timm-parity RandAugment for the tf path (data/randaug_tf.py).

VERDICT r1 #9 done-condition: op-set test enumerating >=14 ops with
magnitude semantics matched to the --aa parser's policy (timm increasing
transforms)."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from vision_transformers_torch_xla_tpu.data.randaug_tf import (  # noqa: E402
    RA_OPS,
    rand_augment_tf,
)

OPS = dict(RA_OPS)


def _img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (32, 40, 3)).astype(np.float32)


def test_op_set_matches_timm_policy():
    assert len(RA_OPS) == 15
    assert set(OPS) == {
        "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize",
        "Solarize", "SolarizeAdd", "Color", "Contrast", "Brightness",
        "Sharpness", "ShearX", "ShearY", "TranslateXRel", "TranslateYRel"}


def test_every_op_runs_and_stays_in_range():
    img = _img()
    for name, fn in RA_OPS:
        out = np.asarray(fn(tf.constant(img), tf.constant(9.0),
                            tf.constant(1.0)))
        assert out.shape == img.shape, name
        assert out.min() >= 0.0 and out.max() <= 255.0, name


def test_invert_and_solarize_semantics():
    img = _img()
    np.testing.assert_allclose(np.asarray(OPS["Invert"](
        tf.constant(img), tf.constant(9.0), tf.constant(1.0))), 255.0 - img)
    # SolarizeIncreasing at level 5: thresh 128, pixels >= 128 inverted
    out = np.asarray(OPS["Solarize"](tf.constant(img), tf.constant(5.0),
                                     tf.constant(1.0)))
    np.testing.assert_allclose(out, np.where(img < 128, img, 255 - img))
    # level 0: threshold 256 -> identity
    out0 = np.asarray(OPS["Solarize"](tf.constant(img), tf.constant(0.0),
                                      tf.constant(1.0)))
    np.testing.assert_allclose(out0, img)


def test_solarize_add_semantics():
    img = _img()
    out = np.asarray(OPS["SolarizeAdd"](tf.constant(img), tf.constant(10.0),
                                        tf.constant(1.0)))
    exp = np.where(img < 128, np.clip(img + 110, 0, 255), img)
    np.testing.assert_allclose(out, exp)


def test_posterize_semantics():
    img = _img()
    # PosterizeIncreasing at level 5: keep 4 - int(2) = 2 bits
    out = np.asarray(OPS["Posterize"](tf.constant(img), tf.constant(5.0),
                                      tf.constant(1.0)))
    exp = (img.astype(np.uint8) >> 6 << 6).astype(np.float32)
    np.testing.assert_allclose(out, exp)


def test_enhance_ops_identity_at_level_zero():
    img = _img()
    for name in ("Color", "Contrast", "Brightness", "Sharpness"):
        out = np.asarray(OPS[name](tf.constant(img), tf.constant(0.0),
                                   tf.constant(1.0)))
        np.testing.assert_allclose(out, img, atol=1.0), name
    # Brightness at full negative magnitude: factor 0.1 -> 10% intensity
    out = np.asarray(OPS["Brightness"](tf.constant(img), tf.constant(10.0),
                                       tf.constant(-1.0)))
    np.testing.assert_allclose(out, np.clip(0.1 * img, 0, 255), atol=0.5)


def test_translate_moves_content():
    img = np.zeros((20, 20, 3), np.float32)
    img[:, :10] = 255.0
    # level 10 -> 0.45 * 20 = 9px shift
    out = np.asarray(OPS["TranslateXRel"](tf.constant(img), tf.constant(10.0),
                                          tf.constant(1.0)))
    # out(x) = in(x + 9): white strip ends at x=0, black from x=1..10,
    # out-of-bounds gray fill from x=11 on
    np.testing.assert_allclose(out[0, 0], [255, 255, 255])
    np.testing.assert_allclose(out[0, 5], [0, 0, 0], atol=1)
    np.testing.assert_allclose(out[0, 19], [128, 128, 128], atol=1)


def test_rotate_90ish_changes_orientation():
    img = np.zeros((21, 21, 3), np.float32)
    img[10, :] = 255.0  # horizontal line through center
    out = np.asarray(OPS["Rotate"](tf.constant(img), tf.constant(10.0),
                                   tf.constant(1.0)))  # 30 degrees
    assert out[10, 0].max() < 200       # line left its original row at the edge
    rows = np.argmax(out[..., 0], axis=0)
    assert rows[1] != rows[19]          # the bright line is now diagonal
    assert out.max() > 200              # content preserved (bilinear blur ok)


def test_autocontrast_stretches():
    img = np.full((8, 8, 3), 100.0, np.float32)
    img[0, 0] = 50.0
    img[7, 7] = 150.0
    out = np.asarray(OPS["AutoContrast"](tf.constant(img), tf.constant(9.0),
                                         tf.constant(1.0)))
    assert out.min() == 0.0 and out.max() == 255.0


def test_equalize_flattens_histogram():
    rng = np.random.default_rng(1)
    img = rng.normal(128, 10, (64, 64, 3)).clip(0, 255).astype(np.float32)
    out = np.asarray(OPS["Equalize"](tf.constant(img), tf.constant(9.0),
                                     tf.constant(1.0)))
    assert out.std() > img.std() * 2  # narrow histogram got stretched


def test_rand_augment_pipeline_runs_and_differs():
    img = tf.constant(_img().astype(np.uint8))
    tf.random.set_seed(0)
    out1 = np.asarray(rand_augment_tf(img, 2, 9.0))
    assert out1.dtype == np.uint8 and out1.shape == (32, 40, 3)
    tf.random.set_seed(1)
    out2 = np.asarray(rand_augment_tf(img, 2, 9.0))
    assert not np.array_equal(out1, out2)


def test_randaug_pp_op_in_spec():
    from vision_transformers_torch_xla_tpu.data.pp_builder import (
        get_preprocess_fn,
    )

    fn = get_preprocess_fn("randaug(2, 9)|value_range(0, 1)")
    out = fn({"image": tf.constant(_img().astype(np.uint8)),
              "label": tf.constant(3)})
    img = np.asarray(out["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0
