"""Checkpoint conversion CLI: torch .pth <-> this framework's formats.

One-liners for users migrating between the reference
(TaiMingLu/vision_transformers_torch_xla, timm .pth pickles — reference
main.py:232-238 --finetune) and this framework:

  # timm/reference .pth -> local-dir (loadable via --model ... pretrained
  # local-dir:, or --finetune <dir>)
  python tools/convert_checkpoint.py import model.pth out_dir/ \
      --architecture vit_base_patch16_224

  # this framework's Orbax training checkpoint (or local-dir) -> timm .pth
  python tools/convert_checkpoint.py export runs/exp1/checkpoints out.pth

Import auto-detects the torch family (ViT/DeiT, ConvNeXt, ResNet, Swin,
EfficientNet superfamily, MobileNetV3/LCNet); export infers it from the
flax tree (override with --arch). BatchNorm running stats ride along in
both directions.
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # conversion never needs a device

import numpy as np  # noqa: E402


def do_import(args) -> None:
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        load_reference_checkpoint,
    )
    from vision_transformers_torch_xla_tpu.models.pretrained import (
        flatten_tree,
        save_local_dir,
    )

    loaded = load_reference_checkpoint(args.src, args.model_key,
                                       args.model_prefix)
    stats = None
    if isinstance(loaded, dict) and set(loaded) <= {"params", "batch_stats"}:
        loaded, stats = loaded["params"], loaded.get("batch_stats")
    save_local_dir(args.dst, args.architecture, loaded)
    if stats:
        import os

        flat = flatten_tree(stats)
        np.savez(os.path.join(args.dst, "batch_stats.npz"),
                 **{k: np.asarray(v) for k, v in flat.items()})
    n = len(flatten_tree(loaded))
    print(f"imported {n} param leaves"
          + (f" + {len(flatten_tree(stats))} batch_stats leaves" if stats
             else "") + f" -> {args.dst}")


def do_export(args) -> None:
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        save_torch_checkpoint,
    )
    from vision_transformers_torch_xla_tpu.models.pretrained import (
        load_state_dict,
    )

    loaded = load_state_dict(args.src)
    variables = loaded if isinstance(loaded, dict) and "params" in loaded \
        and set(loaded) <= {"params", "batch_stats"} else {"params": loaded}
    kw = {"avg_down": True} if getattr(args, "avg_down", False) else {}
    save_torch_checkpoint(args.dst, variables, arch=args.arch or None, **kw)
    print(f"exported -> {args.dst}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import", help="torch .pth -> local-dir")
    imp.add_argument("src", help="torch .pth/.pt/.bin checkpoint")
    imp.add_argument("dst", help="output local-dir")
    imp.add_argument("--architecture", required=True,
                     help="registry name recorded in config.json")
    imp.add_argument("--model_key", default="model|module")
    imp.add_argument("--model_prefix", default="")
    imp.set_defaults(fn=do_import)
    exp = sub.add_parser("export", help="Orbax dir / local-dir / npz -> .pth")
    exp.add_argument("src", help="Orbax checkpoint dir, local-dir, or .npz")
    exp.add_argument("dst", help="output .pth path")
    exp.add_argument("--arch", default="",
                     help="vit|convnext|resnet|swin|efficientnet|mobilenetv3"
                          "|mixer|regnet (inferred from the tree when "
                          "omitted)")
    exp.add_argument("--avg-down", action="store_true", dest="avg_down",
                     help="regnet only: emit timm's avg-pool Sequential "
                          "downsample naming (downsample.1.*) — needed for "
                          "regnetv_064, indistinguishable from weights")
    exp.set_defaults(fn=do_export)
    args = ap.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
