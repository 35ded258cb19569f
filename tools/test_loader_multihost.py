"""Multihost loader invariants test.

Parity with the reference's only distributed test
(reference tools/test_tfds_loader_multihost.py, 447 LoC), verifying the same
two invariants (its docstring :1-19):

  1. **Sharding correctness** — every example must be globally unique across
     processes within an epoch: we hash each example (blake2b over raw bytes,
     like the reference :338-340), allgather digests with
     multihost_utils.process_allgather (replacing xm.rendezvous/mesh_reduce,
     reference :366-373), and fail on duplicates (:409-413).
  2. **Throughput stability** — per-process samples/sec must exceed
     --min-rate and global min/max ratio must exceed --min-ratio
     (reference thresholds :265-268: 0.5 samples/s, ratio 0.6).

Runs on a real multi-host fleet (jax.distributed) or single-process
(trivially passes uniqueness).
"""
from __future__ import annotations

import argparse
import hashlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_set", default="synthetic")
    ap.add_argument("--tfds_data_dir", default="")
    ap.add_argument("--data_path", default="")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--loops", type=int, default=4)
    ap.add_argument("--samples-per-loop", type=int, default=128)
    ap.add_argument("--min-rate", type=float, default=0.5)
    ap.add_argument("--min-ratio", type=float, default=0.6)
    args = ap.parse_args()

    import jax

    from vision_transformers_torch_xla_tpu.core.config import TrainConfig
    from vision_transformers_torch_xla_tpu.data.loader import build_dataset
    from vision_transformers_torch_xla_tpu.parallel.mesh import init_distributed

    init_distributed()
    pid, pcount = jax.process_index(), jax.process_count()

    cfg = TrainConfig(data_set=args.data_set, tfds_data_dir=args.tfds_data_dir,
                      data_path=args.data_path, batch_size=args.batch_size,
                      input_size=args.input_size, shuffle_buffer=10_000,
                      seed=0)
    ds, info = build_dataset(cfg, is_train=True)

    digests = []
    rates = []
    it = iter(ds)
    for loop in range(args.loops):
        t0 = time.time()
        n = 0
        while n < args.samples_per_loop:
            images, labels = next(it)
            for img in np.asarray(images):
                digests.append(hashlib.blake2b(
                    img.tobytes(), digest_size=8).hexdigest())
            n += len(labels)
        rate = n / (time.time() - t0)
        rates.append(rate)
        print(f"[p{pid}] loop {loop}: {rate:.1f} samples/s")

    # invariant 2: throughput
    my_min, my_max = min(rates), max(rates)
    ok_rate = my_min >= args.min_rate
    ok_ratio = (my_min / my_max) >= args.min_ratio if my_max > 0 else False

    # invariant 1: global uniqueness
    if pcount > 1:
        from jax.experimental import multihost_utils

        local = np.frombuffer(
            "".join(digests).encode(), dtype=np.uint8)
        gathered = multihost_utils.process_allgather(local)
        all_digests = ["".join(map(chr, row)) for row in np.asarray(gathered)]
        all_digests = [d[i:i + 16] for d in all_digests
                       for i in range(0, len(d), 16)]
    else:
        all_digests = digests
    n_unique = len(set(all_digests))
    n_total = len(all_digests)
    dup = n_total - n_unique

    ok = ok_rate and ok_ratio and dup == 0
    print(f"[p{pid}] unique {n_unique}/{n_total} (dup={dup}) "
          f"rate min={my_min:.1f} ratio={my_min / max(my_max, 1e-9):.2f} "
          f"-> {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
