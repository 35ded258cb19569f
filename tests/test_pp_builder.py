"""pp string-DSL tests (reference big_vision/pp/builder.py:23-114 semantics).

TF-dependent op behavior is tested only if tensorflow imports (it is present
in this image); the parser/registry tests are TF-free.
"""
import numpy as np
import pytest

from vision_transformers_torch_xla_tpu.data.pp_builder import (
    _parse_call,
    get_preprocess_fn,
    list_pp_ops,
)

tf = pytest.importorskip("tensorflow")


def test_parse_variants():
    assert _parse_call("flip_lr") == ("flip_lr", (), {})
    assert _parse_call("central_crop(224)") == ("central_crop", (224,), {})
    assert _parse_call('value_range(0, 1, in_max=254)') == \
        ("value_range", (0, 1), {"in_max": 254})
    assert _parse_call('keep("image", "label")') == ("keep", ("image", "label"), {})


def test_registry_has_reference_ops():
    """The reference's 7-op set (SURVEY §2.1 C9) must all exist."""
    ops = list_pp_ops()
    for op in ["decode", "decode_jpeg_and_inception_crop", "flip_lr",
               "resize_small", "central_crop", "value_range", "keep"]:
        assert op in ops, op


def test_unknown_op_raises():
    with pytest.raises(ValueError):
        get_preprocess_fn("not_an_op(3)")


def test_eval_chain_shapes():
    """decode|resize_small|central_crop|value_range|keep end to end."""
    img = (np.random.default_rng(0).random((300, 400, 3)) * 255).astype(np.uint8)
    encoded = tf.io.encode_jpeg(img).numpy()
    fn = get_preprocess_fn(
        'decode|resize_small(256)|central_crop(224)|value_range(0, 1)|keep("image", "label")')
    out = fn({"image": tf.constant(encoded), "label": tf.constant(5)})
    assert set(out.keys()) == {"image", "label"}
    assert tuple(out["image"].shape) == (224, 224, 3)
    v = out["image"].numpy()
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_train_chain_shapes():
    img = (np.random.default_rng(1).random((280, 350, 3)) * 255).astype(np.uint8)
    encoded = tf.io.encode_jpeg(img).numpy()
    fn = get_preprocess_fn(
        'decode_jpeg_and_inception_crop(224)|flip_lr|value_range(0, 1)|keep("image", "label")')
    out = fn({"image": tf.constant(encoded), "label": tf.constant(1)})
    assert tuple(out["image"].shape) == (224, 224, 3)


def test_resize_small_keeps_aspect():
    img = np.zeros((100, 200, 3), np.uint8)
    fn = get_preprocess_fn("resize_small(50)")
    out = fn({"image": tf.constant(img)})
    assert tuple(out["image"].shape) == (50, 100, 3)


def test_value_range_maps_bounds():
    img = np.array([[[0, 128, 255]]], np.uint8)
    fn = get_preprocess_fn("value_range(-1, 1)")
    out = fn({"image": tf.constant(img)})["image"].numpy()
    np.testing.assert_allclose(out[0, 0], [-1.0, 128 / 255 * 2 - 1, 1.0], atol=1e-5)
