"""Load reference torch checkpoints into the Flax ViT.

The reference fine-tunes from `.pth` pickles with timm state_dict naming
(reference main.py:232-238 --finetune, utils/__init__.py:550-596
load_state_dict; checkpoint dict keys model/optimizer/epoch per
utils/__init__.py:710-722). This converter maps that naming onto our
param tree so users can migrate checkpoints without retraining.

torch is used only here (CPU wheel, read-only unpickling).
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict

import numpy as np

log = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_vit_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm VisionTransformer state_dict -> our flax params tree."""
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for name, w in sd.items():
        w = _t(w)
        if name == "cls_token":
            put(("cls_token",), w)
        elif name == "dist_token":
            put(("dist_token",), w)  # DeiT distilled (reference deit.py:28)
        elif m := re.match(r"head_dist\.(weight|bias)", name):
            put(("head_dist", "kernel" if m.group(1) == "weight" else "bias"),
                w.T if m.group(1) == "weight" else w)
        elif name == "reg_token":
            put(("reg_token",), w)
        elif name == "pos_embed":
            put(("pos_embed",), w)
        elif name == "patch_embed.proj.weight":
            # OIHW conv -> (kh*kw*C, D) matmul kernel (patchify flattens
            # (p_h, p_w, c) in that order; see models/layers.py PatchEmbed)
            d, c, kh, kw = w.shape
            put(("patch_embed", "proj", "kernel"),
                w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "patch_embed.proj.bias":
            put(("patch_embed", "proj", "bias"), w)
        elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            blk = f"blocks_{i}"
            if m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                put((blk, m2.group(1),
                     "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest):
                sub, kind = m2.group(1), m2.group(2)
                if kind == "weight":
                    put((blk, "attn", sub, "kernel"), w.T)
                else:
                    put((blk, "attn", sub, "bias"), w)
            elif m2 := re.match(r"attn\.(q_norm|k_norm)\.(weight|bias)", rest):
                put((blk, "attn", m2.group(1),
                     "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest):
                sub, kind = m2.group(1), m2.group(2)
                if kind == "weight":
                    put((blk, "mlp", sub, "kernel"), w.T)
                else:
                    put((blk, "mlp", sub, "bias"), w)
            elif m2 := re.match(r"(ls1|ls2)\.gamma", rest):
                put((blk, m2.group(1), "gamma"), w)
            else:
                log.warning("unmapped block param %s", name)
        elif m := re.match(r"(norm|fc_norm)\.(weight|bias)", name):
            put((m.group(1), "scale" if m.group(2) == "weight" else "bias"), w)
        elif m := re.match(r"head\.(weight|bias)", name):
            if m.group(1) == "weight":
                put(("head", "kernel"), w.T)
            else:
                put(("head", "bias"), w)
        elif name.startswith("norm_pre"):
            put(("norm_pre", "scale" if name.endswith("weight") else "bias"), w)
        else:
            log.warning("unmapped param %s (shape %s)", name, w.shape)
    return params


def convert_convnext_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm ConvNeXt state_dict -> our flax params tree (models/convnext.py).

    timm naming (the reference vendors timm's convnext.py): stem.0/1,
    stages.S.downsample.0/1, stages.S.blocks.B.{conv_dw,norm,mlp.fc1,
    mlp.fc2,gamma}, head.norm/head.fc.
    """
    params: Dict[str, Any] = {}

    def put(path, value):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv_to_s2d_kernel(w):
        # OIHW conv == space-to-depth matmul kernel (kh*kw*C_in, C_out)
        o, i, kh, kw = w.shape
        return w.transpose(2, 3, 1, 0).reshape(kh * kw * i, o)

    for name, w in sd.items():
        w = _t(w)
        if name == "stem.0.weight":
            put(("stem_proj", "kernel"), conv_to_s2d_kernel(w))
        elif name == "stem.0.bias":
            put(("stem_proj", "bias"), w)
        elif m := re.match(r"stem\.1\.(weight|bias)", name):
            put(("stem_norm", "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"stages\.(\d+)\.downsample\.0\.(weight|bias)", name):
            put((f"downsample_norm_{m.group(1)}",
                 "scale" if m.group(2) == "weight" else "bias"), w)
        elif m := re.match(r"stages\.(\d+)\.downsample\.1\.weight", name):
            put((f"downsample_proj_{m.group(1)}", "kernel"),
                conv_to_s2d_kernel(w))
        elif m := re.match(r"stages\.(\d+)\.downsample\.1\.bias", name):
            put((f"downsample_proj_{m.group(1)}", "bias"), w)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", name):
            blk = f"stages_{m.group(1)}_blocks_{m.group(2)}"
            rest = m.group(3)
            if rest == "gamma":
                put((blk, "gamma"), w)
            elif m2 := re.match(r"conv_dw\.(weight|bias)", rest):
                if m2.group(1) == "weight":
                    # depthwise OIHW (C,1,7,7) -> HWIO (7,7,1,C)
                    put((blk, "dwconv", "kernel"), w.transpose(2, 3, 1, 0))
                else:
                    put((blk, "dwconv", "bias"), w)
            elif m2 := re.match(r"norm\.(weight|bias)", rest):
                put((blk, "norm",
                     "scale" if m2.group(1) == "weight" else "bias"), w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                tgt = f"pwconv{m2.group(1)}"
                if m2.group(2) == "weight":
                    put((blk, tgt, "kernel"), w.T)
                else:
                    put((blk, tgt, "bias"), w)
            else:
                log.warning("unmapped convnext block param %s", name)
        elif m := re.match(r"head\.norm\.(weight|bias)", name):
            put(("norm", "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"head\.fc\.(weight|bias)", name):
            put(("head", "kernel" if m.group(1) == "weight" else "bias"),
                w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped convnext param %s (shape %s)", name, w.shape)
    return params


def detect_architecture(sd: Dict[str, Any]) -> str:
    keys = list(sd)
    if any(".conv_dw." in k or k.startswith("stem.0") for k in keys):
        return "convnext"
    return "vit"


def load_reference_checkpoint(path: str, model_key: str = "model|module",
                              model_prefix: str = "") -> Dict:
    """Load model params from a torch .pth pickle OR an Orbax checkpoint dir.

    model_key parity with reference --model_key (main.py:235): first matching
    key among 'model|module|...' wins; falls back to the raw dict.
    model_prefix parity with --model_prefix: stripped from state_dict names.
    """
    import os

    if os.path.isdir(path):
        # Orbax checkpoint directory (this framework's own training output):
        # restore raw and return the params (EMA preferred if present)
        from vision_transformers_torch_xla_tpu.ckpt.checkpoint import CheckpointManager

        mngr = CheckpointManager(os.path.abspath(path))
        raw = mngr.restore_raw()
        mngr.close()
        if raw is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        return raw.get("ema_params") or raw["params"]

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = None
    if isinstance(ckpt, dict):
        for key in model_key.split("|"):
            if key in ckpt:
                sd = ckpt[key]
                break
        if sd is None:
            sd = ckpt
    else:
        sd = ckpt
    # strip DDP 'module.' prefixes + user-provided --model_prefix
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    if model_prefix:
        sd = {k[len(model_prefix):] if k.startswith(model_prefix) else k: v
              for k, v in sd.items()}
    if detect_architecture(sd) == "convnext":
        return convert_convnext_state_dict(sd)
    return convert_vit_state_dict(sd)
