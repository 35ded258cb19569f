"""The preprocessing ops, behavior-parity with the reference's 7-op set
(reference big_vision/pp/ops_image.py:21-134, ops_general.py:12-43):

    decode, decode_jpeg_and_inception_crop, flip_lr, resize_small,
    central_crop, value_range, keep

Ops run under tf.data (the reference's input substrate, kept because TF's
C++ threadpool is what feeds TPUs; datasets.py:178-247) — TensorFlow is
imported lazily so the rest of the framework works without it.

Additional ops beyond the reference (the reference parses `--aa` RandAugment
flags but the op is absent/dead, SURVEY §2.1 C9): `randaug` is provided and
actually functional here.
"""
from __future__ import annotations

from vision_transformers_torch_xla_tpu.data.pp_builder import register_pp_op


def _tf():
    import tensorflow as tf  # lazy: keeps core framework TF-free

    return tf


@register_pp_op()
def decode(channels: int = 3):
    """Decode encoded image bytes -> uint8 HWC tensor."""
    tf = _tf()

    def _decode(features):
        features["image"] = tf.io.decode_image(
            features["image"], channels=channels, expand_animations=False)
        return features

    return _decode


@register_pp_op()
def decode_jpeg_and_inception_crop(size: int, area_min: int = 5,
                                   area_max: int = 100,
                                   method: str = "bilinear"):
    """Fused JPEG decode + RandomResizedCrop (inception crop).

    Parity with reference ops_image.py:36-66: sample a distorted bbox with
    area in [area_min, area_max]% and aspect in [3/4, 4/3], crop-decode only
    that window (decode_and_crop_jpeg), then resize to (size, size).
    """
    tf = _tf()

    def _crop(features):
        data = features["image"]
        shape = tf.image.extract_jpeg_shape(data)
        begin, crop_size, _ = tf.image.sample_distorted_bounding_box(
            shape,
            tf.zeros([0, 0, 4], tf.float32),
            area_range=(area_min / 100, area_max / 100),
            min_object_covered=0,
            use_image_if_no_bounding_boxes=True)
        top, left, _ = tf.unstack(begin)
        h, w, _ = tf.unstack(crop_size)
        image = tf.image.decode_and_crop_jpeg(
            data, tf.stack([top, left, h, w]), channels=3)
        image = tf.image.resize(image, (size, size), method=method)
        features["image"] = tf.cast(image, tf.uint8) if image.dtype != tf.uint8 else image
        return features

    return _crop


@register_pp_op()
def flip_lr():
    """Random horizontal flip (reference ops_image.py:69-82)."""
    tf = _tf()

    def _flip(features):
        features["image"] = tf.image.random_flip_left_right(features["image"])
        return features

    return _flip


@register_pp_op()
def resize_small(smaller_size: int, method: str = "area"):
    """Resize so the SHORTER side equals smaller_size, keeping aspect.

    Parity: reference ops_image.py resize_small (antialias area resize).
    """
    tf = _tf()

    def _resize(features):
        image = features["image"]
        h = tf.cast(tf.shape(image)[0], tf.float32)
        w = tf.cast(tf.shape(image)[1], tf.float32)
        ratio = smaller_size / tf.minimum(h, w)
        new_h = tf.cast(tf.round(h * ratio), tf.int32)
        new_w = tf.cast(tf.round(w * ratio), tf.int32)
        image = tf.image.resize(image, (new_h, new_w), method=method)
        features["image"] = tf.cast(image, tf.uint8)
        return features

    return _resize


@register_pp_op()
def central_crop(size: int):
    """Crop the central (size, size) window (reference ops_image.py)."""
    tf = _tf()

    def _crop(features):
        image = features["image"]
        h = tf.shape(image)[0]
        w = tf.shape(image)[1]
        top = (h - size) // 2
        left = (w - size) // 2
        features["image"] = tf.image.crop_to_bounding_box(image, top, left, size, size)
        return features

    return _crop


@register_pp_op()
def value_range(vmin: float = -1.0, vmax: float = 1.0, in_min: float = 0.0,
                in_max: float = 255.0, clip_values: bool = False):
    """Affine-map pixel values from [in_min, in_max] to [vmin, vmax].

    Parity: reference ops_general.py:26-43.
    """
    tf = _tf()

    def _vr(features):
        image = tf.cast(features["image"], tf.float32)
        image = (image - in_min) / (in_max - in_min)
        image = vmin + image * (vmax - vmin)
        if clip_values:
            image = tf.clip_by_value(image, vmin, vmax)
        features["image"] = image
        return features

    return _vr


@register_pp_op()
def keep(*keys: str):
    """Drop every feature except `keys` (reference ops_general.py:12-23)."""

    def _keep(features):
        return {k: v for k, v in features.items() if k in keys}

    return _keep


@register_pp_op()
def normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """ImageNet mean/std normalize. The reference does this on the host AFTER
    tf.data (datasets.py:249-252,308); fusing it into the tf.data graph (or
    doing it on device) removes a host pass."""
    tf = _tf()

    def _norm(features):
        image = tf.cast(features["image"], tf.float32)
        features["image"] = (image - tf.constant(mean)) / tf.constant(std)
        return features

    return _norm


@register_pp_op()
def randaug(num_layers: int = 2, magnitude: float = 9, mstd: float = 0.5,
            prob: float = 0.5):
    """RandAugment, timm 15-op increasing policy (data/randaug_tf.py).

    The reference PARSES `--aa rand-m9-...` but its randaug op module is
    absent so the flag is dead (reference datasets.py:42-45); provided here
    with timm's full op set and magnitude semantics."""
    from vision_transformers_torch_xla_tpu.data.randaug_tf import rand_augment_tf

    def _ra(features):
        features["image"] = rand_augment_tf(
            features["image"], num_layers=num_layers, magnitude=magnitude,
            mstd=mstd, prob=prob)
        return features

    return _ra
