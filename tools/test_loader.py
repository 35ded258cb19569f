"""Single-process input-pipeline smoke test.

Parity with reference tools/test_tfds_loader.py (208 LoC): builds the loader
exactly as the trainer does, pulls N samples, prints shapes/dtypes/labels and
samples/sec. The reference's distributed-without-a-cluster technique
(--world-size/--rank overrides, its :119-122) maps here to
--process-count/--process-index, which monkey-patch jax.process_* so any
shard of an N-way launch can be emulated locally.

Usage:
    python tools/test_loader.py --data_set synthetic --batch_size 8 --num-batches 4
    python tools/test_loader.py --data_set tfds --tfds_data_dir ... \
        --process-count 8 --process-index 3 --time-it
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_set", default="synthetic")
    ap.add_argument("--data_path", default="")
    ap.add_argument("--tfds_data_dir", default="")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--num-batches", type=int, default=4)
    ap.add_argument("--train", action="store_true", default=True)
    ap.add_argument("--eval", dest="train", action="store_false")
    ap.add_argument("--time-it", action="store_true")
    ap.add_argument("--process-count", type=int, default=None,
                    help="emulate an N-process launch")
    ap.add_argument("--process-index", type=int, default=None,
                    help="which shard to emulate")
    args = ap.parse_args()

    import jax

    if args.process_count is not None:
        jax.process_count = lambda: args.process_count
        jax.process_index = lambda: args.process_index or 0

    from vision_transformers_torch_xla_tpu.core.config import TrainConfig
    from vision_transformers_torch_xla_tpu.data.loader import build_dataset

    cfg = TrainConfig(data_set=args.data_set, data_path=args.data_path,
                      tfds_data_dir=args.tfds_data_dir,
                      batch_size=args.batch_size, input_size=args.input_size,
                      shuffle_buffer=1000)
    ds, info = build_dataset(cfg, is_train=args.train)
    print(f"dataset: {args.data_set} | global examples: {info.num_examples} "
          f"| classes: {info.num_classes}")

    it = iter(ds)
    t0 = time.time()
    n = 0
    for i in range(args.num_batches):
        images, labels = next(it)
        n += len(labels)
        print(f"batch {i}: images {images.shape} {images.dtype} "
              f"range [{images.min():.2f}, {images.max():.2f}] "
              f"labels {labels[:8].tolist()}")
    dt = time.time() - t0
    if args.time_it:
        print(f"throughput: {n / dt:.1f} samples/s over {dt:.1f}s")


if __name__ == "__main__":
    main()
