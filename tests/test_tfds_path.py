"""Exercise the TFDS pipeline wiring with a FAKE tensorflow_datasets module.

tfds isn't installed in this image (SURVEY env note); this validates
data/loader.py's tfds code path — split sharding, read config, pp mapping,
batching, normalization — against a stub that serves synthetic JPEGs through
real tf.data.
"""
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


def _make_fake_tfds(n_examples=32, n_classes=7):
    rng = np.random.default_rng(0)

    def sample(i):
        img = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
        return {"image": tf.io.encode_jpeg(img).numpy(),
                "label": i % n_classes}

    samples = [sample(i) for i in range(n_examples)]

    fake = types.ModuleType("tensorflow_datasets")

    class _Split:
        num_examples = n_examples

    class _Label:
        num_classes = n_classes

    class _Info:
        splits = {"train": _Split, "validation": _Split,
                  "train[0%:100%]": _Split}
        features = {"label": _Label}

    class _Builder:
        info = _Info()

        def as_dataset(self, split, shuffle_files, read_config, decoders):
            def gen():
                for s in samples:
                    yield s

            return tf.data.Dataset.from_generator(
                gen, output_signature={
                    "image": tf.TensorSpec((), tf.string),
                    "label": tf.TensorSpec((), tf.int64)})

    fake.builder = lambda name, data_dir=None: _Builder()
    fake.even_splits = lambda split, n: [f"{split}[{i}shard{n}]" for i in range(n)]
    fake.ReadConfig = lambda **kw: types.SimpleNamespace(**kw)
    fake.decode = types.SimpleNamespace(SkipDecoding=lambda: None)
    return fake


def test_tfds_pipeline_end_to_end(monkeypatch):
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", _make_fake_tfds())

    from vision_transformers_torch_xla_tpu.core.config import TrainConfig
    from vision_transformers_torch_xla_tpu.data.loader import TfdsDataset

    cfg = TrainConfig(data_set="tfds", batch_size=4, input_size=32,
                      shuffle_buffer=8, num_parallel_calls=2)
    pp = ('decode|resize_small(36)|central_crop(32)|value_range(0, 1)|'
          'keep("image", "label")')
    ds = TfdsDataset(cfg, is_train=False, pp_spec=pp, batch_size=4)
    assert ds.info.num_examples == 32
    assert ds.info.num_classes == 7
    images, labels = next(iter(ds))
    assert images.shape == (4, 32, 32, 3)
    assert images.dtype == np.float32
    assert labels.dtype == np.int32 and (labels < 7).all()
    # normalized: mean-ish centered
    assert abs(images.mean()) < 3.0


def test_tfds_train_path_shuffles_and_batches(monkeypatch):
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", _make_fake_tfds())

    from vision_transformers_torch_xla_tpu.core.config import TrainConfig
    from vision_transformers_torch_xla_tpu.data.loader import TfdsDataset

    cfg = TrainConfig(data_set="tfds", batch_size=4, input_size=32,
                      shuffle_buffer=8, num_parallel_calls=2, cache_raw=False)
    pp = ('decode_jpeg_and_inception_crop(32)|flip_lr|value_range(0, 1)|'
          'keep("image", "label")')
    ds = TfdsDataset(cfg, is_train=True, pp_spec=pp, batch_size=4)
    it = iter(ds)
    a = next(it)
    b = next(it)
    assert a[0].shape == (4, 32, 32, 3)
    assert not np.allclose(a[0], b[0])


def test_tfds_honors_norm_constants(monkeypatch):
    """--imagenet_default_mean_and_std false -> inception stats on the tfds
    path; --device_augment -> raw [0,1] pixels (VERDICT r1 #4 / ADVICE r1)."""
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", _make_fake_tfds())

    from vision_transformers_torch_xla_tpu.core.config import TrainConfig
    from vision_transformers_torch_xla_tpu.data.loader import build_dataset

    pp = ('decode|resize_small(36)|central_crop(32)|value_range(0, 1)|'
          'keep("image", "label")')

    def batch_for(**kw):
        cfg = TrainConfig(data_set="tfds", batch_size=4, input_size=32,
                          shuffle_buffer=8, num_parallel_calls=2,
                          pp_eval=pp, **kw)
        ds, _ = build_dataset(cfg, is_train=False)
        return next(iter(ds))[0]

    raw = batch_for(device_augment=True)
    assert raw.min() >= 0.0 and raw.max() <= 1.0  # raw [0,1] contract

    inception = batch_for(imagenet_default_mean_and_std=False)
    np.testing.assert_allclose(inception, (raw - 0.5) / 0.5, atol=1e-5)

    default = batch_for()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(default, (raw - mean) / std, atol=1e-5)
