"""Input pipelines: TFDS (parity path), image-folder, and synthetic.

TPU-native redesign of the reference's loader
(reference datasets.py:80-389 `BigVisionImageNetDataset`):

  * per-process sharding via `tfds.even_splits`-style interleaving keyed on
    `jax.process_index()` (the reference keys on torch.distributed rank,
    datasets.py:174-176);
  * per-epoch reseeded shuffle (datasets.py:258-261);
  * the reference's numpy -> torch -> XLA double hop (datasets.py:301-308)
    is gone: batches go straight to device as NHWC jnp arrays, and
    normalization/mixup happen inside the jitted step;
  * host options parity (private threadpool, no intra-op parallelism,
    datasets.py:70-77).

Because this machine has no TFDS install and no ImageNet, `synthetic` (an
infinite deterministic random-image stream with real labels) and `folder`
(PIL over a class-per-directory tree) keep everything runnable end-to-end.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
# --imagenet_default_mean_and_std false -> inception-style normalization
# (parity with the reference/timm flag, reference main.py:246)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


def norm_constants(cfg):
    if getattr(cfg, "device_augment", False):
        # raw [0,1] pixels to device; normalization happens inside the
        # jitted step (data/device_aug.py)
        return (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    if getattr(cfg, "imagenet_default_mean_and_std", True):
        return IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD
    return IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD

# default pp strings — parity with the reference's defaults
# (reference main.py:289-295: pp_train / pp_eval flags)
DEFAULT_PP_TRAIN = ("decode_jpeg_and_inception_crop(224)|flip_lr|"
                    "value_range(0, 1)|keep(\"image\", \"label\")")
DEFAULT_PP_EVAL = ("decode|resize_small(256)|central_crop(224)|"
                   "value_range(0, 1)|keep(\"image\", \"label\")")


@dataclasses.dataclass
class DatasetInfo:
    num_examples: int          # GLOBAL size (parity: datasets.py:171-172)
    num_classes: int

    def steps_per_epoch(self, global_batch: int) -> int:
        return self.num_examples // global_batch


class SyntheticDataset:
    """Deterministic synthetic ImageNet-shaped stream.

    Images are procedural (class-conditioned low-frequency patterns + noise)
    so a model CAN fit them — loss decreasing end-to-end is testable without
    real data.
    """

    def __init__(self, batch_size: int, image_size: int = 224,
                 num_classes: int = 1000, num_examples: int = 1_281_167,
                 seed: int = 0, normalize: bool = True,
                 mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_classes = num_classes
        self.info = DatasetInfo(num_examples, num_classes)
        self._seed = seed
        self._normalize = normalize
        self._mean, self._std = mean, std

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        from vision_transformers_torch_xla_tpu.data import native

        if self._normalize and native.available():
            # native path: ~3 orders of magnitude faster than the numpy one
            seed = self._seed + jax.process_index() * 1_000_003 + 1
            step = 0
            while True:
                yield native.synth_batch(self.batch_size, self.image_size,
                                         self.num_classes, seed + step,
                                         mean=self._mean, std=self._std)
                step += 1
        rng = np.random.default_rng(self._seed + jax.process_index())
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        while True:
            labels = rng.integers(0, self.num_classes, self.batch_size)
            freq = (labels % 16 + 1).astype(np.float32)
            phase = (labels // 16 % 64).astype(np.float32) / 64 * 2 * np.pi
            base = np.sin(freq[:, None, None] * 6.28 * (yy + xx)[None] +
                          phase[:, None, None])
            images = base[..., None].repeat(3, axis=-1) * 0.25 + 0.5
            images += rng.normal(0, 0.05, images.shape).astype(np.float32)
            images = images.astype(np.float32)
            if self._normalize:
                images = (images - np.asarray(self._mean, np.float32)) / \
                    np.asarray(self._std, np.float32)
            yield images.astype(np.float32), labels.astype(np.int32)


def _finalize_tf_pipeline(ds, cfg, is_train: bool, pp_spec: str,
                          batch_size: int, epoch_seed: int):
    """Shared tf.data tail for EVERY tf-backed source (tfds, tfrecord):
    host options -> [cache] -> [shuffle] -> map(pp DSL) -> batch -> prefetch
    (reference datasets.py:209-237 order). One epoch = one pass — the
    reference does not `.repeat()` (datasets.py:178-247); per-epoch
    re-iteration rebuilds the pipeline with a fresh seed."""
    import tensorflow as tf

    from vision_transformers_torch_xla_tpu.data.pp_builder import get_preprocess_fn

    # host options (reference datasets.py:70-77)
    opts = tf.data.Options()
    opts.threading.private_threadpool_size = 48
    opts.threading.max_intra_op_parallelism = 1
    opts.experimental_optimization.inject_prefetch = False
    ds = ds.with_options(opts)

    if is_train:
        if cfg.cache_raw:
            ds = ds.cache()
        ds = ds.shuffle(cfg.shuffle_buffer, seed=epoch_seed)
    pp_fn = get_preprocess_fn(pp_spec)
    ds = ds.map(pp_fn, num_parallel_calls=cfg.num_parallel_calls)
    ds = ds.batch(batch_size, drop_remainder=is_train)
    ds = ds.prefetch(cfg.prefetch)
    return ds


def _tfds_dataset(cfg, is_train: bool, pp_spec: str, batch_size: int,
                  epoch_seed: int = 0):
    """TFDS -> tf.data pipeline (reference datasets.py:178-247 semantics)."""
    import tensorflow_datasets as tfds

    builder = tfds.builder(cfg.tfds_name,
                           data_dir=cfg.tfds_data_dir or None)
    split_name = cfg.train_split if is_train else cfg.val_split
    num_examples = builder.info.splits[split_name].num_examples
    num_classes = builder.info.features["label"].num_classes

    # per-process shard (reference datasets.py:174-176)
    split = tfds.even_splits(split_name, jax.process_count())[jax.process_index()]
    read_config = tfds.ReadConfig(
        shuffle_seed=epoch_seed if is_train else None,
        skip_prefetch=True)
    ds = builder.as_dataset(
        split=split, shuffle_files=is_train, read_config=read_config,
        decoders={"image": tfds.decode.SkipDecoding()})

    ds = _finalize_tf_pipeline(ds, cfg, is_train, pp_spec, batch_size,
                               epoch_seed)
    return ds, DatasetInfo(num_examples, num_classes)


class _TfBackedDataset:
    """Per-epoch-reseeded tf.data wrapper (reference datasets.py:254-322):
    each `iter()` rebuilds the pipeline with seed + epoch, pulls numpy
    batches, and applies host normalization unless stats are identity
    (the device_augment raw-[0,1] contract)."""

    def __init__(self, cfg, is_train: bool, pp_spec: str, batch_size: int,
                 mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
        self.cfg, self.is_train = cfg, is_train
        self.pp_spec, self.batch_size = pp_spec, batch_size
        self._epoch = -1
        self._mean = np.asarray(mean, np.float32)
        self._std = np.asarray(std, np.float32)
        self._identity = bool(np.all(self._mean == 0) and np.all(self._std == 1))
        self.info = self._build_info()

    def _build_info(self) -> DatasetInfo:
        raise NotImplementedError

    def _build(self, epoch_seed: int):
        raise NotImplementedError

    def __iter__(self):
        # per-epoch reseed (reference datasets.py:258-261)
        self._epoch += 1
        ds = self._build(epoch_seed=self.cfg.seed + self._epoch)
        for batch in ds.as_numpy_iterator():
            images = batch["image"].astype(np.float32)
            if not self._identity:
                images = (images - self._mean) / self._std
            yield images, batch["label"].astype(np.int32)


class TfdsDataset(_TfBackedDataset):
    def _build_info(self) -> DatasetInfo:
        _, info = _tfds_dataset(self.cfg, self.is_train, self.pp_spec,
                                self.batch_size)
        return info

    def _build(self, epoch_seed: int):
        ds, _ = _tfds_dataset(self.cfg, self.is_train, self.pp_spec,
                              self.batch_size, epoch_seed=epoch_seed)
        return ds


class TFRecordDataset(_TfBackedDataset):
    """`--data_set tfrecord`: raw Example shards through the SAME pipeline
    tail as the tfds branch (see data/tfrecord.py for schema + sharding)."""

    def __init__(self, cfg, is_train: bool, pp_spec: str, batch_size: int,
                 mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self._pi = jax.process_index() if process_index is None else process_index
        self._pc = jax.process_count() if process_count is None else process_count
        self._pattern = (cfg.data_path if is_train
                         else (cfg.eval_data_path or cfg.data_path))
        super().__init__(cfg, is_train, pp_spec, batch_size,
                         mean=mean, std=std)

    def _build_info(self) -> DatasetInfo:
        from vision_transformers_torch_xla_tpu.data import tfrecord as tfr

        meta = tfr.load_metadata(self._pattern)
        if meta is not None:
            return DatasetInfo(meta["num_examples"],
                               meta.get("num_classes") or self.cfg.nb_classes)
        return DatasetInfo(tfr.count_examples(self._pattern),
                           self.cfg.nb_classes)

    def _build(self, epoch_seed: int):
        from vision_transformers_torch_xla_tpu.data import tfrecord as tfr

        ds = tfr.tfrecord_source(self._pattern, self.is_train, epoch_seed,
                                 self._pi, self._pc)
        return _finalize_tf_pipeline(ds, self.cfg, self.is_train,
                                     self.pp_spec, self.batch_size,
                                     epoch_seed)


class FolderDataset:
    """class-per-directory image tree via PIL (no TF needed)."""

    def __init__(self, root: str, batch_size: int, image_size: int = 224,
                 is_train: bool = True, seed: int = 0,
                 mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
        import pathlib

        self._mean = np.asarray(mean, np.float32)
        self._std = np.asarray(std, np.float32)

        self.root = pathlib.Path(root)
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [
            (p, self.class_to_idx[d.name])
            for d in sorted(self.root.iterdir()) if d.is_dir()
            for p in sorted(d.iterdir())
            if p.suffix.lower() in (".jpg", ".jpeg", ".png")]
        # per-process shard
        self.samples = self.samples[jax.process_index()::jax.process_count()]
        self.batch_size = batch_size
        self.image_size = image_size
        self.is_train = is_train
        self._seed = seed
        self.info = DatasetInfo(
            len(self.samples) * jax.process_count(), len(classes))

    def _load(self, path, rng):
        from PIL import Image

        img = Image.open(path).convert("RGB")
        s = self.image_size
        if self.is_train:
            scale = rng.uniform(0.4, 1.0)
            w, h = img.size
            cw = max(1, int(w * math.sqrt(scale)))
            ch = max(1, int(h * math.sqrt(scale)))
            x0 = rng.integers(0, w - cw + 1)
            y0 = rng.integers(0, h - ch + 1)
            img = img.crop((x0, y0, x0 + cw, y0 + ch)).resize((s, s))
            if rng.random() < 0.5:
                img = img.transpose(0)  # FLIP_LEFT_RIGHT
        else:
            w, h = img.size
            ratio = (s * 256 // 224) / min(w, h)
            img = img.resize((int(w * ratio), int(h * ratio)))
            w, h = img.size
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w - s) // 2 + s, (h - s) // 2 + s))
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - self._mean) / self._std

    def __iter__(self):
        rng = np.random.default_rng(self._seed)
        order = rng.permutation(len(self.samples)) if self.is_train \
            else np.arange(len(self.samples))
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idx = order[i:i + self.batch_size]
            images = np.stack([self._load(self.samples[j][0], rng) for j in idx])
            labels = np.asarray([self.samples[j][1] for j in idx], np.int32)
            yield images.astype(np.float32), labels


def build_dataset(cfg, is_train: bool):
    """(dataset, info) by cfg.data_set — parity with reference
    datasets.py:325-389 build_dataset returning (dataset, nb_classes)."""
    batch = cfg.batch_size if is_train else cfg.eval_batch_size()
    # every path honors --imagenet_default_mean_and_std and the
    # device_augment raw-[0,1] contract through norm_constants(cfg)
    mean, std = norm_constants(cfg)
    if cfg.data_set == "synthetic":
        ds = SyntheticDataset(
            batch, cfg.input_size, cfg.nb_classes,
            cfg.synthetic_train_size if is_train else cfg.synthetic_val_size,
            seed=cfg.seed, normalize=True, mean=mean, std=std)
        return ds, ds.info
    if cfg.data_set == "tfds":
        pp = (cfg.pp_train or DEFAULT_PP_TRAIN) if is_train else \
            (cfg.pp_eval or DEFAULT_PP_EVAL)
        ds = TfdsDataset(cfg, is_train, pp, batch, mean=mean, std=std)
        return ds, ds.info
    if cfg.data_set == "tfrecord":
        pp = (cfg.pp_train or DEFAULT_PP_TRAIN) if is_train else \
            (cfg.pp_eval or DEFAULT_PP_EVAL)
        ds = TFRecordDataset(cfg, is_train, pp, batch, mean=mean, std=std)
        return ds, ds.info
    if cfg.data_set in ("wds", "IMNET_WDS"):
        from vision_transformers_torch_xla_tpu.data.wds import WdsDataset

        spec = cfg.data_path if is_train else (cfg.eval_data_path or cfg.data_path)
        ds = WdsDataset(spec, batch, cfg.input_size, is_train, cfg.seed,
                        num_classes=cfg.nb_classes, mean=mean, std=std)
        return ds, ds.info
    if cfg.data_set == "folder":
        root = cfg.data_path if is_train else (cfg.eval_data_path or cfg.data_path)
        ds = FolderDataset(root, batch, cfg.input_size, is_train, cfg.seed,
                           mean=mean, std=std)
        return ds, ds.info
    raise ValueError(f"unknown data_set {cfg.data_set!r}")


def device_prefetch(iterator, put, size: int = 2):
    """Stage host batches on device `size` steps ahead of compute, so H2D
    transfer overlaps the step. Replaces torch_xla's MpDeviceLoader
    background upload (reference main.py:1008-1029).

    `put(batch)` maps one host batch to device buffers (e.g. a sharded
    device_put); it runs eagerly while the consumer computes.
    """
    import collections
    import itertools

    it = iter(iterator)
    queue = collections.deque(put(b) for b in itertools.islice(it, size))
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
