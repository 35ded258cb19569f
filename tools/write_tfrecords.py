#!/usr/bin/env python
"""Convert a class-per-directory image tree into TFRecord shards consumable
by `--data_set tfrecord` (data/tfrecord.py schema: encoded image bytes +
int64 label + metadata sidecar).

Usage:
    python tools/write_tfrecords.py --src /path/imagenet/train \
        --out /path/tfr --prefix train --num-shards 1024

The source layout matches FolderDataset (data/loader.py): one subdirectory
per class, sorted class names -> label ids. Images are stored as their raw
encoded bytes (no re-encode) — decoding happens in the training pp DSL,
mirroring the reference's SkipDecoding stance (reference datasets.py:199-204).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from vision_transformers_torch_xla_tpu.data.tfrecord import write_tfrecord_shards

EXTS = (".jpg", ".jpeg", ".png")


def iter_folder(src: pathlib.Path):
    classes = sorted(d.name for d in src.iterdir() if d.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    n = 0
    for d in sorted(src.iterdir()):
        if not d.is_dir():
            continue
        for p in sorted(d.iterdir()):
            if p.suffix.lower() in EXTS:
                yield p.read_bytes(), class_to_idx[d.name]
                n += 1
                if n % 10_000 == 0:
                    print(f"  {n} examples...", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="class-per-dir image tree")
    ap.add_argument("--out", required=True, help="output shard directory")
    ap.add_argument("--prefix", default="train")
    ap.add_argument("--num-shards", type=int, default=256)
    args = ap.parse_args()

    src = pathlib.Path(args.src)
    num_classes = sum(1 for d in src.iterdir() if d.is_dir())
    meta = write_tfrecord_shards(iter_folder(src), args.out,
                                 prefix=args.prefix,
                                 num_shards=args.num_shards,
                                 num_classes=num_classes)
    print(f"wrote {meta['num_examples']} examples / {meta['num_classes']} "
          f"classes into {meta['num_shards']} shards: {meta['pattern']}")


if __name__ == "__main__":
    main()
