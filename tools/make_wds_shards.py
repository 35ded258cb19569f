"""Build webdataset tar shards from a class-per-directory image tree
(or synthetic images for testing).

Companion to data/wds.py — the reference documents this format
(WEBDATASET_USAGE_GUIDE.md) but ships no writer.

Usage:
    python tools/make_wds_shards.py --out /data/wds --src /data/imagenet/train \
        --samples-per-shard 10000
    python tools/make_wds_shards.py --out /tmp/wds --synthetic 100 --classes 10
"""
from __future__ import annotations

import argparse
import io
import os
import sys
import tarfile

import numpy as np

sys.path.insert(0, ".")


def synthetic_jpeg(rng, size=96):
    from PIL import Image

    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--src", default="")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--classes", type=int, default=10)
    ap.add_argument("--samples-per-shard", type=int, default=10_000)
    ap.add_argument("--image-size", type=int, default=96)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)

    def samples():
        if args.synthetic:
            rng = np.random.default_rng(0)
            for i in range(args.synthetic):
                yield f"{i:08d}", synthetic_jpeg(rng, args.image_size), \
                    int(rng.integers(0, args.classes))
        else:
            classes = sorted(d for d in os.listdir(args.src)
                             if os.path.isdir(os.path.join(args.src, d)))
            idx = {c: i for i, c in enumerate(classes)}
            i = 0
            for c in classes:
                for f in sorted(os.listdir(os.path.join(args.src, c))):
                    if f.lower().endswith((".jpg", ".jpeg")):
                        with open(os.path.join(args.src, c, f), "rb") as fh:
                            yield f"{i:08d}", fh.read(), idx[c]
                        i += 1

    shard_idx, n_in_shard, total = 0, 0, 0
    tar = None
    for key, jpg, cls in samples():
        if tar is None or n_in_shard >= args.samples_per_shard:
            if tar:
                tar.close()
            path = os.path.join(args.out, f"shard-{shard_idx:06d}.tar")
            tar = tarfile.open(path, "w")
            shard_idx += 1
            n_in_shard = 0
        for ext, data in ((".jpg", jpg), (".cls", str(cls).encode())):
            info = tarfile.TarInfo(key + ext)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        n_in_shard += 1
        total += 1
    if tar:
        tar.close()
    print(f"wrote {total} samples into {shard_idx} shard(s) at {args.out}")


if __name__ == "__main__":
    main()
