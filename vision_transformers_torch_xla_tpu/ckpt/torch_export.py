"""Export Flax checkpoints back to timm-format torch state dicts.

The inverse of ckpt/torch_compat.py: users of the reference
(TaiMingLu/vision_transformers_torch_xla, which fine-tunes from timm .pth
pickles — reference main.py:232-238 --finetune) can train here and take
the weights back to any torch/timm stack. Round-trip identity with the
family converters is pinned by tests/test_torch_compat.py (every test
builds its synthetic timm state dict THROUGH these exporters).

Families: ViT/DeiT, ConvNeXt, ResNet (+SE/ECA/deep-stem, BatchNorm running
stats from the 'batch_stats' collection), Swin (incl. the PatchMerging
channel-order permutation), EfficientNet superfamily, MobileNetV3/LCNet,
MLP-Mixer family, RegNet X/Y/V/Z, BEiT v1/v2, CaiT, XCiT,
PVTv2, SwinV2, ConvNeXt-V2, EVA/EVA-02, VGG, DenseNet, GhostNet v1/v2,
ResNetV2/BiT, MaxxVit (maxvit/coatnet/maxxvit).
Architecture is inferred from the flax tree's top-level names.

Only `save_torch_checkpoint` imports torch (CPU wheel); the exporters
return plain numpy dicts.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
    _swin_merge_perm,
)


def _flatten(tree: Any, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _oihw(k: np.ndarray) -> np.ndarray:
    """flax HWIO conv kernel -> torch OIHW."""
    return k.transpose(3, 2, 0, 1)


_NORM_T = {"scale": "weight", "bias": "bias",
           "mean": "running_mean", "var": "running_var"}


def detect_flax_architecture(params: Dict[str, Any]) -> str:
    keys = set(params)
    if any(re.match(r"cls_attn_blocks_\d+", k) for k in keys):
        return "xcit"
    if any(re.match(r"patch_embed_\d+$", k) for k in keys):
        return "pvt2"
    if any(re.match(r"blocks_token_only_\d+", k) for k in keys):
        return "cait"
    if any(re.match(r"blocks_\d+_attn$", k) for k in keys):
        return "beit"
    if any(re.match(r"blocks_\d+$", k) and (
            "gamma_1" in params[k] or "mlp_fc1" in params[k]
            or ("mlp" in params[k] and "fc1_g" in params[k]["mlp"]))
           for k in keys):
        return "eva"
    if any(re.match(r"stages_\d+_blocks_\d+", k) and "attn" in params[k]
           and "logit_scale" in params[k]["attn"] for k in keys):
        return "swinv2"
    # metaformer: flattened stage blocks with Dense MLPs + a downsample_0
    # stem conv (before regnet/resnetv2, whose blocks also carry normN)
    if "downsample_0" in keys and any(
            re.match(r"stages_\d+_blocks_\d+$", k) and "mlp_fc1" in params[k]
            for k in keys):
        return "metaformer"
    # resnetv2: pre-act blocks (normN children like regnet's) but a
    # top-level final pre-act `norm` that regnet/resnet never have
    if "norm" in keys and any(re.match(r"stem_conv\d?$", k) for k in keys) \
            and any(re.match(r"stages_\d+_blocks_\d+", k) for k in keys):
        return "resnetv2"
    if any(re.match(r"merge_norm_\d+", k) for k in keys):
        return "swin"
    if any(re.match(r"stages_\d+_blocks_\d+", k) for k in keys) \
            and "stem_proj" in keys:
        return "convnext"
    # regnet blocks carry normN children (resnet's are bnN)
    if any(re.match(r"stages_\d+_blocks_\d+", k) and "norm2" in params[k]
           for k in keys):
        return "regnet"
    if any(re.match(r"stem_conv\d?$", k) for k in keys) \
            and any(re.match(r"stages_\d+_blocks_\d+", k) for k in keys):
        return "resnet"
    if any(re.match(r"s\d+_b\d+_(win|grid|pm|conv_prenorm|conv_dw)$", k)
           for k in keys):
        return "maxxvit"  # before efficientnet: shares the s{i}_b{j} style
    if any(re.match(r"s\d+_b\d+_", k) for k in keys):
        return "efficientnet"
    if any(re.match(r"blocks_\d+_(dw|pw_exp)$", k) for k in keys):
        return "mobilenetv3"
    if "pre_logits_fc1" in keys:
        return "vgg"
    if "final_bn" in keys and any(re.match(r"db\d+_l\d+_", k) for k in keys):
        return "densenet"
    if "conv_head" in keys and any(re.fullmatch(r"b\d+_\d+", k)
                                   for k in keys):
        return "ghostnet"
    if "stem" in keys and any(re.match(r"blocks_\d+$", k) for k in keys):
        return "mixer"
    if "patch_embed" in keys and any(re.match(r"blocks_\d+$", k)
                                     for k in keys):
        return "vit"
    raise ValueError(
        f"cannot infer a timm export family from params with top-level "
        f"names {sorted(keys)[:10]}...; pass arch= explicitly")


def export_vit_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax ViT/DeiT tree -> timm VisionTransformer state_dict."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top in ("cls_token", "dist_token", "reg_token", "pos_embed"):
            sd[top] = w
        elif top == "patch_embed":
            if path[1] == "norm":
                # embed_norm (aimv2 towers: reference embed_norm_layer)
                sd["patch_embed.norm."
                   + ("weight" if path[-1] == "scale" else "bias")] = w
            elif path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["patch_embed.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["patch_embed.proj.bias"] = w
        elif m := re.match(r"blocks_(\d+)$", top):
            pre = f"blocks.{m.group(1)}."
            mod = path[1]
            if mod in ("norm1", "norm2"):
                sd[pre + f"{mod}." + ("weight" if path[2] == "scale"
                                      else "bias")] = w
            elif mod in ("ls1", "ls2"):
                sd[pre + f"{mod}.gamma"] = w
            elif mod == "attn":
                sub = path[2]
                if sub in ("q_norm", "k_norm", "norm"):
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "scale" else "bias")] = w
                else:
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
            elif mod == "mlp":
                sd[pre + f"mlp.{path[2]}."
                   + ("weight" if path[3] in ("kernel",) else
                      "weight" if path[3] == "scale" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            else:
                raise ValueError(f"vit export: unmapped {path}")
        elif top == "attn_pool":
            # MAP head (timm AttentionPoolLatent; reference :603-618)
            sub = path[1]
            if sub == "latent":
                sd["attn_pool.latent"] = w
            elif sub == "mlp":
                sd[f"attn_pool.mlp.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            elif sub == "norm":
                sd["attn_pool.norm."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            else:  # q / kv / proj
                sd[f"attn_pool.{sub}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
        elif top in ("norm", "fc_norm", "norm_pre"):
            sd[f"{top}." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top in ("head", "head_dist"):
            sd[f"{top}." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"vit export: unmapped {path}")
    return sd


def export_convnext_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax ConvNeXt tree -> timm ConvNeXt state_dict."""
    sd: Dict[str, np.ndarray] = {}

    def s2d_to_conv(w, stride):
        kk, o = w.shape
        i = kk // (stride * stride)
        return w.reshape(stride, stride, i, o).transpose(3, 2, 0, 1)

    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top == "stem_proj":
            if path[-1] == "kernel":
                sd["stem.0.weight"] = s2d_to_conv(w, 4)
            else:
                sd["stem.0.bias"] = w
        elif top == "stem_norm":
            sd["stem.1." + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"downsample_norm_(\d+)", top):
            sd[f"stages.{m.group(1)}.downsample.0."
               + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"downsample_proj_(\d+)", top):
            if path[-1] == "kernel":
                sd[f"stages.{m.group(1)}.downsample.1.weight"] = \
                    s2d_to_conv(w, 2)
            else:
                sd[f"stages.{m.group(1)}.downsample.1.bias"] = w
        elif m := re.match(r"stages_(\d+)_blocks_(\d+)", top):
            pre = f"stages.{m.group(1)}.blocks.{m.group(2)}."
            mod = path[1]
            if mod == "gamma":
                sd[pre + "gamma"] = w
            elif mod == "dwconv":
                if path[-1] == "kernel":
                    sd[pre + "conv_dw.weight"] = w.transpose(3, 2, 0, 1)
                else:
                    sd[pre + "conv_dw.bias"] = w
            elif mod == "norm":
                sd[pre + "norm."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif m2 := re.match(r"pwconv(\d)", mod):
                sd[pre + f"mlp.fc{m2.group(1)}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod == "grn_gamma":
                sd[pre + "mlp.grn.weight"] = w
            elif mod == "grn_beta":
                sd[pre + "mlp.grn.bias"] = w
            else:
                raise ValueError(f"convnext export: unmapped {path}")
        elif top == "norm":
            sd["head.norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top == "head":
            sd["head.fc." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"convnext export: unmapped {path}")
    return sd


def export_resnet_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax ResNet tree (+batch_stats) -> timm ResNet state_dict."""
    sd: Dict[str, np.ndarray] = {}
    deep = "stem_conv1" in variables["params"]
    deep_conv_idx = {"1": "0", "2": "3", "3": "6"}
    deep_bn_idx = {"1": "1", "2": "4"}
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if m := re.match(r"stages_(\d+)_blocks_(\d+)", top):
                pre = f"layer{int(m.group(1)) + 1}.{m.group(2)}."
                mod = path[1]
                if mod.startswith("conv"):
                    sd[pre + f"{mod}.weight"] = _oihw(w)
                elif mod == "downsample_conv":
                    sd[pre + "downsample.0.weight"] = _oihw(w)
                elif mod == "downsample_bn":
                    sd[pre + f"downsample.1.{kind}"] = w
                elif mod.startswith("bn"):
                    sd[pre + f"{mod}.{kind}"] = w
                elif mod == "attn_se_reduce":
                    sd[pre + "se.fc1."
                       + ("weight" if path[2] == "kernel" else "bias")] = \
                        _oihw(w) if path[2] == "kernel" else w
                elif mod == "attn_se_expand":
                    sd[pre + "se.fc2."
                       + ("weight" if path[2] == "kernel" else "bias")] = \
                        _oihw(w) if path[2] == "kernel" else w
                elif mod == "attn_eca_conv":
                    sd[pre + "se.conv.weight"] = w.transpose(2, 1, 0)
                else:
                    raise ValueError(f"resnet export: unmapped {path}")
            elif top == "head":
                sd["fc." + ("weight" if path[1] == "kernel" else "bias")] = \
                    w.T if path[1] == "kernel" else w
            elif top == "stem_conv":
                sd["conv1.weight"] = _oihw(w)
            elif m := re.match(r"stem_conv(\d)", top):
                sd[f"conv1.{deep_conv_idx[m.group(1)]}.weight"] = _oihw(w)
            elif top == "stem_bn" or (top == "stem_bn3" and deep):
                sd[f"bn1.{kind}"] = w
            elif m := re.match(r"stem_bn(\d)", top):
                sd[f"conv1.{deep_bn_idx[m.group(1)]}.{kind}"] = w
            elif top == "stem_pool_conv":
                sd["maxpool.0.weight"] = _oihw(w)
            elif top == "stem_pool_bn":
                sd[f"maxpool.1.{kind}"] = w
            else:
                raise ValueError(f"resnet export: unmapped {path}")
    return sd


def _qkv_3hd_to_headfirst(w: np.ndarray, dim_head: int = 32) -> np.ndarray:
    """Inverse of torch_compat._qkv_headfirst_to_3hd: (3, heads, dim_head)
    fused-qkv rows -> timm head-first (heads, 3, dim_head) order."""
    r = w.shape[0]
    heads = max(1, r // 3 // dim_head)
    hd = r // 3 // heads
    idx = np.arange(r).reshape(3, heads, hd).transpose(1, 0, 2).reshape(-1)
    return w[idx]


def export_maxxvit_state_dict(variables: Dict[str, Any],
                              tf: bool = False,
                              se_early: bool = False,
                              dim_head: int = 32) -> Dict[str, np.ndarray]:
    """Our flax MaxxVit tree (+batch_stats) -> timm maxxvit state_dict
    (inverse of convert_maxxvit_state_dict; reference maxxvit.py naming).

    tf=True emits the TF-ported layout (head_first=False qkv rows kept
    as-is, RelPosBiasTf table transposed to (heads, L)); default emits
    the rw layout (head-first qkv rows, (L, heads) bias table).
    se_early=True names the MBConv SE module `se_early` (the
    conv_attn_early coatnet variants)."""
    sd: Dict[str, np.ndarray] = {}
    se_name = "se_early" if se_early else "se"

    def put_dense_as_conv(dst, path, w, qkv=False):
        if path[-1] == "kernel":
            w = np.asarray(w).T
            if qkv and not tf:
                w = _qkv_3hd_to_headfirst(w, dim_head)
            sd[f"{dst}.weight"] = w[:, :, None, None]
        else:
            w = np.asarray(w)
            if qkv and not tf:
                w = _qkv_3hd_to_headfirst(w, dim_head)
            sd[f"{dst}.bias"] = w

    def put_dense(dst, path, w, qkv=False):
        if path[-1] == "kernel":
            w = np.asarray(w).T
            if qkv and not tf:
                w = _qkv_3hd_to_headfirst(w, dim_head)
            sd[f"{dst}.weight"] = w
        else:
            w = np.asarray(w)
            if qkv and not tf:
                w = _qkv_3hd_to_headfirst(w, dim_head)
            sd[f"{dst}.bias"] = w

    def put_relpos(dst, path, w):
        if path[1] == "rel_pos_table":
            sd[f"{dst}.relative_position_bias_table"] = \
                np.asarray(w).T if tf else np.asarray(w)
        else:  # fc1/fc2 Dense
            put_dense(f"{dst}.mlp.{path[1]}", path, w)

    def put_attn_cl(dst, path, w):
        """flax _PartitionAttn children -> AttentionCl-holder keys."""
        mod = path[1]
        kind = _NORM_T.get(path[-1], path[-1])
        if mod in ("norm1", "norm2"):
            sd[f"{dst}.{mod}.{kind}"] = w
        elif mod == "qkv":
            put_dense(f"{dst}.attn.qkv", path, w, qkv=True)
        elif mod == "proj":
            put_dense(f"{dst}.attn.proj", path, w)
        elif mod == "rel_pos":
            put_relpos(f"{dst}.attn.rel_pos", path[1:], w)
        elif mod in ("ls1", "ls2"):
            sd[f"{dst}.{mod}.gamma"] = w
        elif mod in ("mlp_fc1", "mlp_fc2"):
            put_dense(f"{dst}.mlp.fc{mod[-1]}", path, w)
        else:
            raise ValueError(f"maxxvit export: unmapped attn {path}")

    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            w = np.asarray(w)
            if m := re.match(r"stem_conv(\d)$", top):
                sd[f"stem.conv{m.group(1)}."
                   + ("weight" if path[-1] == "kernel" else "bias")] = \
                    _oihw(w) if path[-1] == "kernel" else w
            elif top == "stem_norm1":
                sd[f"stem.norm1.{kind}"] = w
            elif m := re.match(r"s(\d+)_b(\d+)_(.+)", top):
                pre = f"stages.{m.group(1)}.blocks.{m.group(2)}"
                tail = m.group(3)
                if m2 := re.match(r"conv_(prenorm|norm\d?)$", tail):
                    tn = ("pre_norm" if m2.group(1) == "prenorm"
                          else m2.group(1))
                    sd[f"{pre}.conv.{tn}.{kind}"] = w
                elif m2 := re.match(r"conv_(conv1|conv2_dw|conv3|dw)$",
                                    tail):
                    tn = {"conv1": "conv1_1x1", "conv2_dw": "conv2_kxk",
                          "conv3": "conv3_1x1", "dw": "conv_dw"}[m2.group(1)]
                    sd[f"{pre}.conv.{tn}."
                       + ("weight" if path[-1] == "kernel" else "bias")] = \
                        _oihw(w) if path[-1] == "kernel" else w
                elif m2 := re.match(r"conv_mlp(1|2)$", tail):
                    sd[f"{pre}.conv.mlp.fc{m2.group(1)}."
                       + ("weight" if path[-1] == "kernel" else "bias")] = \
                        _oihw(w) if path[-1] == "kernel" else w
                elif m2 := re.match(r"conv_se_fc(1|2)$", tail):
                    sd[f"{pre}.conv.{se_name}.fc{m2.group(1)}."
                       + ("weight" if path[-1] == "kernel" else "bias")] = \
                        _oihw(w) if path[-1] == "kernel" else w
                elif tail == "conv_short":
                    sd[f"{pre}.conv.shortcut.expand."
                       + ("weight" if path[-1] == "kernel" else "bias")] = \
                        _oihw(w) if path[-1] == "kernel" else w
                elif tail == "conv_ls":
                    sd[f"{pre}.conv.ls.gamma"] = w
                elif tail in ("win", "grid"):
                    dst = (f"{pre}.attn_block" if tail == "win"
                           else f"{pre}.attn_grid")
                    put_attn_cl(dst, path, w)
                elif tail == "pm":
                    mod = path[1]
                    if m3 := re.match(r"(qkv|proj|rel_pos)_(win|grid)$",
                                      mod):
                        dst = (f"{pre}.attn.attn_block"
                               if m3.group(2) == "win"
                               else f"{pre}.attn.attn_grid")
                        if m3.group(1) == "qkv":
                            put_dense(f"{dst}.qkv", path, w, qkv=True)
                        elif m3.group(1) == "proj":
                            put_dense(f"{dst}.proj", path, w)
                        else:
                            put_relpos(f"{dst}.rel_pos", path[1:], w)
                    else:
                        put_attn_cl(f"{pre}.attn", path, w)
                # CoAtNet TransformerBlock2d (flat flax names)
                elif tail == "norm1":
                    # stride-2 first blocks wrap norm1 in a Sequential
                    wrap = ".norm" if m.group(2) == "0" else ""
                    sd[f"{pre}.norm1{wrap}.{kind}"] = w
                elif tail == "norm2":
                    sd[f"{pre}.norm2.{kind}"] = w
                elif tail == "short":
                    put_dense_as_conv(f"{pre}.shortcut.expand", path, w)
                elif tail == "qkv":
                    put_dense_as_conv(f"{pre}.attn.qkv", path, w, qkv=True)
                elif tail == "proj":
                    put_dense_as_conv(f"{pre}.attn.proj", path, w)
                elif tail == "rel_pos":
                    put_relpos(f"{pre}.attn.rel_pos", path, w)
                elif tail in ("ls1", "ls2"):
                    sd[f"{pre}.{tail}.gamma"] = w
                elif m2 := re.match(r"mlp(1|2)$", tail):
                    put_dense_as_conv(f"{pre}.mlp.fc{m2.group(1)}", path, w)
                else:
                    raise ValueError(f"maxxvit export: unmapped {path}")
            elif top == "final_norm":
                sd[f"norm.{kind}"] = w
            elif top == "head_norm":
                sd[f"head.norm.{kind}"] = w
            elif top == "head_pre_logits":
                put_dense("head.pre_logits.fc", path, w)
            elif top == "classifier":
                put_dense("head.fc", path, w)
            else:
                raise ValueError(f"maxxvit export: unmapped {path}")
    return sd


def export_resnetv2_state_dict(
        variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax ResNetV2/BiT tree (+batch_stats for the BN variants) ->
    timm resnetv2 state_dict (inverse of convert_resnetv2_state_dict;
    reference resnetv2.py:455-612 naming). The conv classifier head
    (ClassifierHead use_conv=True) is emitted 4-D."""
    sd: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if m := re.match(r"stages_(\d+)_blocks_(\d+)$", top):
                pre = f"stages.{m.group(1)}.blocks.{m.group(2)}."
                mod = path[1]
                if mod == "downsample":
                    sd[pre + "downsample.conv.weight"] = _oihw(w)
                elif mod.startswith("conv"):
                    sd[pre + f"{mod}.weight"] = _oihw(w)
                elif mod.startswith("norm"):
                    sd[pre + f"{mod}.{kind}"] = w
                else:
                    raise ValueError(f"resnetv2 export: unmapped {path}")
            elif top == "stem_conv":
                sd["stem.conv.weight"] = _oihw(w)
            elif m := re.match(r"stem_conv(\d)$", top):
                sd[f"stem.conv{int(m.group(1)) + 1}.weight"] = _oihw(w)
            elif m := re.match(r"stem_norm(\d)$", top):
                sd[f"stem.norm{int(m.group(1)) + 1}.{kind}"] = w
            elif top == "norm":
                sd[f"norm.{kind}"] = w
            elif top == "head":
                if path[1] == "kernel":
                    sd["head.fc.weight"] = \
                        np.asarray(w).T[:, :, None, None]
                else:
                    sd["head.fc.bias"] = w
            else:
                raise ValueError(f"resnetv2 export: unmapped {path}")
    return sd


def export_swin_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax Swin tree -> timm SwinTransformer state_dict (buffers like
    relative_position_index are recomputed by torch, not exported)."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top == "patch_embed":
            if path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["patch_embed.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["patch_embed.proj.bias"] = w
        elif top == "patch_norm":
            sd["patch_embed.norm."
               + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"merge_norm_(\d+)", top):
            inv = np.argsort(_swin_merge_perm(w.shape[0]))
            sd[f"layers.{m.group(1)}.downsample.norm."
               + ("weight" if path[1] == "scale" else "bias")] = w[inv]
        elif m := re.match(r"merge_proj_(\d+)", top):
            inv = np.argsort(_swin_merge_perm(w.shape[0]))
            sd[f"layers.{m.group(1)}.downsample.reduction.weight"] = \
                w.T[:, inv]
        elif m := re.match(r"stages_(\d+)_blocks_(\d+)", top):
            pre = f"layers.{m.group(1)}.blocks.{m.group(2)}."
            mod = path[1]
            if mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod == "attn" and path[2] == "rel_pos_bias_table":
                sd[pre + "attn.relative_position_bias_table"] = w
            elif mod == "attn":
                sd[pre + f"attn.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            elif mod == "mlp":
                sd[pre + f"mlp.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            else:
                raise ValueError(f"swin export: unmapped {path}")
        elif top == "norm":
            sd["norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top == "head":
            sd["head.fc."
               + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"swin export: unmapped {path}")
    return sd


def export_efficientnet_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax effnet-builder tree (+batch_stats) -> timm state_dict.

    Block type is inferred from each block's flax module set (mirror of the
    importer's timm-side inference).
    """
    from collections import defaultdict

    sd: Dict[str, np.ndarray] = {}
    block_mods = defaultdict(set)
    for path in _flatten(variables["params"]):
        if m := re.match(r"s(\d+)_b(\d+)_([a-z_]+)", path[0]):
            block_mods[(m.group(1), m.group(2))].add(m.group(3))

    def table_for(mods):
        if "pw_exp" in mods:
            return {"pw_exp": "conv_pw", "pw_exp_norm": "bn1",
                    "dw": "conv_dw", "dw_norm": "bn2",
                    "pw_proj": "conv_pwl", "pw_proj_norm": "bn3"}
        if "conv_exp" in mods:
            return {"conv_exp": "conv_exp", "conv_exp_norm": "bn1",
                    "pw_proj": "conv_pwl", "pw_proj_norm": "bn2"}
        if "dw" in mods:
            return {"dw": "conv_dw", "dw_norm": "bn1",
                    "pw_proj": "conv_pw", "pw_proj_norm": "bn2"}
        return {"conv": "conv", "norm": "bn1"}

    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if m := re.match(r"s(\d+)_b(\d+)_([a-z_]+)", top):
                s, b, mod = m.groups()
                pre = f"blocks.{s}.{b}."
                if mod.startswith("se_"):
                    sd[pre + f"se.conv_{mod[3:]}."
                       + ("weight" if path[1] == "kernel" else "bias")] = \
                        _oihw(w) if path[1] == "kernel" else w
                    continue
                t = table_for(block_mods[(s, b)])[mod]
                if path[1] == "conv":
                    sd[pre + f"{t}.weight"] = _oihw(w)
                else:
                    sd[pre + f"{t}.{kind}"] = w
            elif top == "stem_conv":
                sd["conv_stem.weight"] = _oihw(w)
            elif top == "stem_norm":
                sd[f"bn1.{kind}"] = w
            elif top == "head_conv":
                sd["conv_head."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    _oihw(w) if path[2] == "kernel" else w
            elif top == "head_norm":
                sd[f"bn2.{kind}"] = w
            elif top == "classifier":
                sd["classifier."
                   + ("weight" if path[1] == "kernel" else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"efficientnet export: unmapped {path}")
    return sd


def export_mobilenetv3_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flat-numbered MobileNetV3/LCNet tree -> timm state_dict
    (blocks_N -> blocks.N.0, head_conv/head_bn -> the trailing ConvBnAct
    block, head_fc -> conv_head)."""
    from collections import defaultdict

    sd: Dict[str, np.ndarray] = {}
    block_mods = defaultdict(set)
    n_blocks = -1
    for path in _flatten(variables["params"]):
        if m := re.match(r"blocks_(\d+)_([a-z_]+)", path[0]):
            block_mods[m.group(1)].add(m.group(2))
            n_blocks = max(n_blocks, int(m.group(1)))

    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if m := re.match(r"blocks_(\d+)_([a-z_]+)", top):
                n, mod = m.groups()
                pre = f"blocks.{n}.0."
                ir = "pw_exp" in block_mods[n]
                table = ({"pw_exp": "conv_pw", "bn_exp": "bn1",
                          "dw": "conv_dw", "bn_dw": "bn2",
                          "pw": "conv_pwl", "bn_pw": "bn3"} if ir else
                         {"dw": "conv_dw", "bn_dw": "bn1",
                          "pw": "conv_pw", "bn_pw": "bn2"})
                if mod.startswith("se_"):
                    sd[pre + f"se.conv_{mod[3:]}."
                       + ("weight" if path[1] == "kernel" else "bias")] = \
                        _oihw(w) if path[1] == "kernel" else w
                elif path[1] == "kernel":
                    sd[pre + f"{table[mod]}.weight"] = _oihw(w)
                else:
                    sd[pre + f"{table[mod]}.{kind}"] = w
            elif top == "stem_conv":
                sd["conv_stem.weight"] = _oihw(w)
            elif top == "stem_bn":
                sd[f"bn1.{kind}"] = w
            elif top == "head_conv":
                sd[f"blocks.{n_blocks + 1}.0.conv.weight"] = _oihw(w)
            elif top == "head_bn":
                sd[f"blocks.{n_blocks + 1}.0.bn1.{kind}"] = w
            elif top == "head_fc":
                sd["conv_head."
                   + ("weight" if path[1] == "kernel" else "bias")] = \
                    _oihw(w) if path[1] == "kernel" else w
            elif top == "classifier":
                sd["classifier."
                   + ("weight" if path[1] == "kernel" else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"mobilenetv3 export: unmapped {path}")
    return sd


def export_mixer_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax MLP-Mixer/gMixer/ResMLP/gMLP tree -> timm state_dict
    (inverse of torch_compat.convert_mixer_state_dict; gMLP's flattened
    gate modules re-nest under mlp_channels)."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top == "stem":
            if path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["stem.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["stem.proj.bias"] = w
        elif m := re.match(r"blocks_(\d+)$", top):
            pre = f"blocks.{m.group(1)}."
            mod = path[1]
            if mod in ("norm1", "norm2", "norm", "gate_norm"):
                t = "mlp_channels.gate.norm" if mod == "gate_norm" else mod
                sd[pre + f"{t}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif m2 := re.match(r"(norm1|norm2)_(alpha|beta)", mod):
                sd[pre + f"{m2.group(1)}.{m2.group(2)}"] = w
            elif mod in ("ls1", "ls2"):
                sd[pre + mod] = w
            elif mod in ("mlp_tokens", "mlp_channels"):
                sd[pre + f"{mod}.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            elif m2 := re.match(r"(mlp_tokens|mlp_channels)_fc(\d)", mod):
                # gMixer's flattened GluMlp modules re-nest on export
                sd[pre + f"{m2.group(1)}.fc{m2.group(2)}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod == "linear_tokens":
                sd[pre + "linear_tokens."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod in ("fc1", "fc2"):
                sd[pre + f"mlp_channels.{mod}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod == "gate_proj":
                sd[pre + "mlp_channels.gate.proj."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            else:
                raise ValueError(f"mixer export: unmapped {path}")
        elif top == "norm":
            sd["norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"norm_(alpha|beta)", top):
            sd[f"norm.{m.group(1)}"] = w
        elif top == "head":
            sd["head." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"mixer export: unmapped {path}")
    return sd


def export_eva_state_dict(variables: Dict[str, Any],
                          qkv_fused: bool = True) -> Dict[str, np.ndarray]:
    """Our flax Eva tree -> timm Eva state_dict.

    qkv_fused=True emits the fused layout (attn.qkv.weight + q_bias/v_bias;
    our k bias is dropped — a no-op under softmax, and timm keeps it as a
    zero buffer). qkv_fused=False emits separate q_proj/k_proj/v_proj with
    the k bias preserved exactly (the eva02 base/large layout). The MLP
    layout follows the tree: fc1_g + norm -> SwiGLU names, fc1_g without
    norm -> fused GluMlp fc1 (gate first), mlp_fcN -> plain Mlp names."""
    sd: Dict[str, np.ndarray] = {}
    params = variables["params"]
    for path, w in _flatten(params).items():
        top = path[0]
        if top in ("cls_token", "reg_token", "pos_embed"):
            sd[top] = w
        elif top == "patch_embed":
            if path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["patch_embed.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["patch_embed.proj.bias"] = w
        elif top in ("norm_pre", "norm", "fc_norm"):
            sd[f"{top}." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top == "attn_pool":
            mod = path[1]
            if mod == "latent":
                sd["attn_pool.latent"] = w
            elif mod in ("q", "kv", "proj"):
                sd[f"attn_pool.{mod}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod == "norm":
                sd["attn_pool.norm."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod == "mlp":
                sd[f"attn_pool.mlp.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            else:
                raise ValueError(f"eva export: unmapped {path}")
        elif m := re.match(r"blocks_(\d+)$", top):
            pre = f"blocks.{m.group(1)}."
            mod = path[1]
            if m2 := re.match(r"gamma_(\d)", mod):
                sd[pre + mod] = w
            elif mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod == "attn":
                sub = path[2]
                if sub == "qkv":
                    dim = w.shape[-1] // 3 if path[3] == "bias" \
                        else w.shape[0]
                    if path[3] == "kernel":
                        if qkv_fused:
                            sd[pre + "attn.qkv.weight"] = w.T
                        else:
                            qw, kw_, vw = np.split(w.T, 3, axis=0)
                            sd[pre + "attn.q_proj.weight"] = qw
                            sd[pre + "attn.k_proj.weight"] = kw_
                            sd[pre + "attn.v_proj.weight"] = vw
                    else:
                        qb, kb, vb = np.split(w, 3)
                        if qkv_fused:
                            sd[pre + "attn.q_bias"] = qb
                            sd[pre + "attn.v_bias"] = vb
                        else:
                            sd[pre + "attn.q_proj.bias"] = qb
                            sd[pre + "attn.k_proj.bias"] = kb
                            sd[pre + "attn.v_proj.bias"] = vb
                elif sub in ("q_norm", "k_norm"):
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "scale" else "bias")] = w
                else:
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
            elif mod == "mlp":
                sub = path[2]
                blk_mlp = params[top]["mlp"]
                has_norm = "norm" in blk_mlp
                if sub == "norm":
                    sd[pre + "mlp.norm."
                       + ("weight" if path[3] == "scale" else "bias")] = w
                elif sub in ("fc1_g", "fc1_x") and not has_norm:
                    # fused GluMlp: emit packed fc1 once, gate first
                    if sub == "fc1_g":
                        leaf = path[3]
                        g = np.asarray(blk_mlp["fc1_g"][leaf])
                        u = np.asarray(blk_mlp["fc1_x"][leaf])
                        packed = np.concatenate(
                            [g.T, u.T] if leaf == "kernel" else [g, u],
                            axis=0)
                        sd[pre + "mlp.fc1."
                           + ("weight" if leaf == "kernel" else "bias")] = \
                            packed
                else:
                    sd[pre + f"mlp.{sub}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
            elif m2 := re.match(r"mlp_fc(\d)", mod):
                sd[pre + f"mlp.fc{m2.group(1)}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            else:
                raise ValueError(f"eva export: unmapped {path}")
        elif top == "head":
            sd["head." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"eva export: unmapped {path}")
    return sd


def export_swinv2_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax SwinV2 tree -> timm SwinTransformerV2 state_dict (cpb MLP
    re-nests as cpb_mlp.0/.2; the PatchMerging reduction's input channels
    permute back to timm's (w_sub, h_sub, c) flatten order)."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top == "patch_embed":
            if path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["patch_embed.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["patch_embed.proj.bias"] = w
        elif top == "patch_norm":
            sd["patch_embed.norm."
               + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"merge_proj_(\d+)", top):
            inv = np.argsort(_swin_merge_perm(w.shape[0]))
            sd[f"layers.{m.group(1)}.downsample.reduction.weight"] = \
                w.T[:, inv]
        elif m := re.match(r"merge_norm_(\d+)", top):
            sd[f"layers.{m.group(1)}.downsample.norm."
               + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"stages_(\d+)_blocks_(\d+)", top):
            pre = f"layers.{m.group(1)}.blocks.{m.group(2)}."
            mod = path[1]
            if mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod == "attn":
                sub = path[2]
                if sub in ("logit_scale", "q_bias", "v_bias"):
                    sd[pre + f"attn.{sub}"] = w
                elif sub == "cpb_fc1":
                    sd[pre + "attn.cpb_mlp.0."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
                elif sub == "cpb_fc2":
                    sd[pre + "attn.cpb_mlp.2.weight"] = w.T
                else:
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
            elif mod == "mlp":
                sd[pre + f"mlp.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            else:
                raise ValueError(f"swinv2 export: unmapped {path}")
        elif top == "norm":
            sd["norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top == "head":
            sd["head.fc."
               + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"swinv2 export: unmapped {path}")
    return sd


def export_pvt2_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax PVTv2 tree -> timm PyramidVisionTransformerV2 state_dict
    (stage-0 embed re-nests as the stem patch_embed, later ones as
    stages.N.downsample; the flattened MLP re-nests under mlp.*)."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if m := re.match(r"patch_embed_(\d+)", top):
            n = int(m.group(1))
            pre = "patch_embed." if n == 0 else f"stages.{n}.downsample."
            sd[pre + "proj." + ("weight" if path[1] == "kernel" else "bias")] \
                = _oihw(w) if path[1] == "kernel" else w
        elif m := re.match(r"embed_norm_(\d+)", top):
            n = int(m.group(1))
            pre = "patch_embed." if n == 0 else f"stages.{n}.downsample."
            sd[pre + "norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"stage_norm_(\d+)", top):
            sd[f"stages.{m.group(1)}.norm."
               + ("weight" if path[1] == "scale" else "bias")] = w
        elif m := re.match(r"stages_(\d+)_blocks_(\d+)", top):
            pre = f"stages.{m.group(1)}.blocks.{m.group(2)}."
            mod = path[1]
            if mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod == "attn":
                sub = path[2]
                if sub == "sr":
                    sd[pre + "attn.sr."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        _oihw(w) if path[3] == "kernel" else w
                elif sub == "sr_norm":
                    sd[pre + "attn.norm."
                       + ("weight" if path[3] == "scale" else "bias")] = w
                else:
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
            elif mod in ("fc1", "fc2"):
                sd[pre + f"mlp.{mod}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod == "dwconv":
                sd[pre + "mlp.dwconv."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    _oihw(w) if path[2] == "kernel" else w
            else:
                raise ValueError(f"pvt2 export: unmapped {path}")
        elif top == "head":
            sd["head." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"pvt2 export: unmapped {path}")
    return sd


def export_xcit_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax XCiT tree (+batch_stats) -> timm Xcit state_dict (conv patch
    stem re-nests as Sequential pairs; pos_proj re-shapes to the 1x1
    token_projection conv; rel buffers don't exist in this family)."""
    sd: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if top == "cls_token":
                sd["cls_token"] = w
            elif m := re.match(r"patch_embed_conv(\d)", top):
                sd[f"patch_embed.proj.{2 * int(m.group(1))}.0.weight"] = \
                    _oihw(w)
            elif m := re.match(r"patch_embed_bn(\d)", top):
                sd[f"patch_embed.proj.{2 * int(m.group(1))}.1.{kind}"] = w
            elif top == "pos_proj":
                if path[-1] == "kernel":
                    sd["pos_embed.token_projection.weight"] = \
                        w.T[:, :, None, None]
                else:
                    sd["pos_embed.token_projection.bias"] = w
            elif m := re.match(r"cls_attn_blocks_(\d+)$", top):
                pre = f"cls_attn_blocks.{m.group(1)}."
                mod = path[1]
                if m2 := re.match(r"gamma(\d)", mod):
                    sd[pre + mod] = w
                elif mod in ("norm1", "norm2"):
                    sd[pre + f"{mod}."
                       + ("weight" if path[2] == "scale" else "bias")] = w
                elif mod in ("q", "k", "v", "proj"):
                    sd[pre + f"attn.{mod}."
                       + ("weight" if path[2] == "kernel" else "bias")] = \
                        w.T if path[2] == "kernel" else w
                elif mod == "mlp":
                    sd[pre + f"mlp.{path[2]}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
                else:
                    raise ValueError(f"xcit export: unmapped {path}")
            elif m := re.match(r"blocks_(\d+)$", top):
                pre = f"blocks.{m.group(1)}."
                mod = path[1]
                if m2 := re.match(r"gamma(\d)", mod):
                    sd[pre + mod] = w
                elif mod in ("norm1", "norm2", "norm3"):
                    sd[pre + f"{mod}."
                       + ("weight" if path[2] == "scale" else "bias")] = w
                elif mod == "attn":
                    sub = path[2]
                    if sub == "temperature":
                        sd[pre + "attn.temperature"] = w
                    else:
                        sd[pre + f"attn.{sub}."
                           + ("weight" if path[3] == "kernel" else "bias")] = \
                            w.T if path[3] == "kernel" else w
                elif mod == "local_mp":
                    sub = path[2]
                    if sub in ("conv1", "conv2"):
                        sd[pre + f"local_mp.{sub}."
                           + ("weight" if path[3] == "kernel" else "bias")] = \
                            _oihw(w) if path[3] == "kernel" else w
                    else:  # bn
                        sd[pre + f"local_mp.bn.{kind}"] = w
                elif mod == "mlp":
                    sd[pre + f"mlp.{path[2]}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
                else:
                    raise ValueError(f"xcit export: unmapped {path}")
            elif top == "norm":
                sd["norm." + ("weight" if path[1] == "scale" else "bias")] = w
            elif top == "head":
                sd["head." + ("weight" if path[1] == "kernel" else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"xcit export: unmapped {path}")
    return sd


def export_cait_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax Cait tree -> timm Cait state_dict (head-mix einsum kernels
    transpose back to Linear weights; ls/gamma re-flatten to gamma_N)."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top in ("cls_token", "pos_embed"):
            sd[top] = w
        elif top == "patch_embed":
            if path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["patch_embed.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["patch_embed.proj.bias"] = w
        elif m := re.match(r"blocks_token_only_(\d+)$", top):
            pre = f"blocks_token_only.{m.group(1)}."
            mod = path[1]
            if m2 := re.match(r"gamma(\d)", mod):
                sd[pre + f"gamma_{m2.group(1)}"] = w
            elif mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod in ("q", "k", "v", "proj"):
                sd[pre + f"attn.{mod}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            elif mod == "mlp":
                sd[pre + f"mlp.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            else:
                raise ValueError(f"cait export: unmapped {path}")
        elif m := re.match(r"blocks_(\d+)$", top):
            pre = f"blocks.{m.group(1)}."
            mod = path[1]
            if m2 := re.match(r"ls(\d)", mod):
                sd[pre + f"gamma_{m2.group(1)}"] = w
            elif mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[2] == "scale" else "bias")] = w
            elif mod == "attn":
                sub = path[2]
                if m2 := re.match(r"(proj_l|proj_w)_(kernel|bias)", sub):
                    sd[pre + f"attn.{m2.group(1)}."
                       + ("weight" if m2.group(2) == "kernel" else "bias")] = \
                        w.T if m2.group(2) == "kernel" else w
                else:
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[3] == "kernel" else "bias")] = \
                        w.T if path[3] == "kernel" else w
            elif mod == "mlp":
                sd[pre + f"mlp.{path[2]}."
                   + ("weight" if path[3] == "kernel" else "bias")] = \
                    w.T if path[3] == "kernel" else w
            else:
                raise ValueError(f"cait export: unmapped {path}")
        elif top == "norm":
            sd["norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top == "head":
            sd["head." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"cait export: unmapped {path}")
    return sd


def export_beit_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flat-block flax Beit tree -> timm Beit state_dict (q/v biases
    split back out; rel-pos index buffers are recomputed by torch)."""
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(variables["params"]).items():
        top = path[0]
        if top == "cls_token":
            sd["cls_token"] = w
        elif top == "patch_embed":
            if path[-1] == "kernel":
                kk, d = w.shape
                p = int(round((kk // 3) ** 0.5))
                sd["patch_embed.proj.weight"] = \
                    w.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
            else:
                sd["patch_embed.proj.bias"] = w
        elif m := re.match(r"blocks_(\d+)_([a-z0-9_]+)", top):
            pre = f"blocks.{m.group(1)}."
            mod = m.group(2)
            if m2 := re.match(r"ls(\d)", mod):
                sd[pre + f"gamma_{m2.group(1)}"] = w
            elif mod in ("norm1", "norm2"):
                sd[pre + f"{mod}."
                   + ("weight" if path[1] == "scale" else "bias")] = w
            elif mod == "attn":
                sub = path[1]
                if sub == "rel_pos_bias_table":
                    sd[pre + "attn.relative_position_bias_table"] = w
                elif sub in ("q_bias", "v_bias"):
                    sd[pre + f"attn.{sub}"] = w
                else:
                    sd[pre + f"attn.{sub}."
                       + ("weight" if path[2] == "kernel" else "bias")] = \
                        w.T if path[2] == "kernel" else w
            elif mod == "mlp":
                sd[pre + f"mlp.{path[1]}."
                   + ("weight" if path[2] == "kernel" else "bias")] = \
                    w.T if path[2] == "kernel" else w
            else:
                raise ValueError(f"beit export: unmapped {path}")
        elif top == "fc_norm":
            sd["fc_norm." + ("weight" if path[1] == "scale" else "bias")] = w
        elif top == "head":
            sd["head." + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        else:
            raise ValueError(f"beit export: unmapped {path}")
    return sd


def export_regnet_state_dict(variables: Dict[str, Any],
                             avg_down: bool = False) -> Dict[str, np.ndarray]:
    """Our flax RegNet tree (+batch_stats) -> timm RegNet state_dict.

    Preact (regnetv) trunks are recognized by the missing stem_bn: their
    convs export as bare weights and the normN params keep their names;
    non-preact blocks re-nest as ConvNormAct convN.conv/convN.bn pairs.
    avg_down=True emits the `downsample.1.*` Sequential naming of timm's
    avg-pool shortcut (regnetv_064 is the only registered user) — the two
    layouts are indistinguishable from weights alone.
    """
    sd: Dict[str, np.ndarray] = {}
    preact = "stem_bn" not in variables["params"]
    ds_conv = "downsample.1." if avg_down else "downsample."
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if m := re.match(r"stages_(\d+)_blocks_(\d+)", top):
                pre = f"s{int(m.group(1)) + 1}.b{int(m.group(2)) + 1}."
                mod = path[1]
                if mod.startswith("conv"):
                    sd[pre + (f"{mod}.weight" if preact
                              else f"{mod}.conv.weight")] = _oihw(w)
                elif m2 := re.match(r"norm(\d)", mod):
                    sd[pre + (f"{mod}.{kind}" if preact
                              else f"conv{m2.group(1)}.bn.{kind}")] = w
                elif mod in ("se_reduce", "se_expand"):
                    fc = "fc1" if mod == "se_reduce" else "fc2"
                    sd[pre + f"se.{fc}."
                       + ("weight" if path[2] == "kernel" else "bias")] = \
                        _oihw(w) if path[2] == "kernel" else w
                elif mod == "down_conv":
                    sd[pre + ds_conv + ("weight" if preact
                                        else "conv.weight")] = _oihw(w)
                elif mod == "down_norm":
                    sd[pre + ds_conv + f"bn.{kind}"] = w
                else:
                    raise ValueError(f"regnet export: unmapped {path}")
            elif top == "stem_conv":
                sd["stem.weight" if preact else "stem.conv.weight"] = _oihw(w)
            elif top == "stem_bn":
                sd[f"stem.bn.{kind}"] = w
            elif top == "final_conv":
                sd["final_conv.conv.weight"] = _oihw(w)
            elif top == "final_conv_bn":
                sd[f"final_conv.bn.{kind}"] = w
            elif top == "head":
                sd["head.fc."
                   + ("weight" if path[1] == "kernel" else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"regnet export: unmapped {path}")
    return sd


def export_vgg_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax VGG tree (+batch_stats for _bn variants) -> timm VGG
    state_dict. timm's `features` is a flat nn.Sequential over
    conv/BN/ReLU/maxpool (reference vgg.py:130-149), so the Sequential
    indices are rebuilt by walking the variant's cfg (identified by conv
    count — the four classic cfgs have 8/10/13/16 convs)."""
    from vision_transformers_torch_xla_tpu.models.vgg import _CFGS

    params = variables["params"]
    bn = "features_0_bn" in params
    n_convs = len([k for k in params if re.fullmatch(r"features_\d+", k)])
    by_count = {len([v for v in cfg if v != "M"]): cfg
                for cfg in _CFGS.values()}
    cfg = by_count[n_convs]
    conv_idx, bn_idx, idx, li = {}, {}, 0, 0
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        conv_idx[li] = idx
        if bn:
            bn_idx[li] = idx + 1
        idx += 3 if bn else 2
        li += 1

    sd: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if m := re.fullmatch(r"features_(\d+)", top):
                sd[f"features.{conv_idx[int(m.group(1))]}."
                   + ("weight" if path[1] == "kernel" else "bias")] = \
                    _oihw(w) if path[1] == "kernel" else w
            elif m := re.fullmatch(r"features_(\d+)_bn", top):
                sd[f"features.{bn_idx[int(m.group(1))]}.{kind}"] = w
            elif m := re.fullmatch(r"pre_logits_fc(1|2)", top):
                sd[f"pre_logits.fc{m.group(1)}."
                   + ("weight" if path[1] == "kernel" else "bias")] = \
                    _oihw(w) if path[1] == "kernel" else w
            elif top == "head":
                sd["head.fc." + ("weight" if path[1] == "kernel"
                                 else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"vgg export: unmapped {path}")
    return sd


def export_densenet_state_dict(
        variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax DenseNet tree (+batch_stats) -> timm DenseNet state_dict
    (features.conv0/norm0 [deep stems: conv1/norm1/conv2/norm2],
    denseblock{B}.denselayer{L} 1-based, transition{B}, norm5,
    classifier — reference densenet.py:276-338)."""
    sd: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if top == "stem_conv":
                sd["features.conv0.weight"] = _oihw(w)
            elif m := re.fullmatch(r"stem_conv(\d)", top):
                sd[f"features.conv{m.group(1)}.weight"] = _oihw(w)
            elif top == "stem_bn":
                sd[f"features.norm0.{kind}"] = w
            elif m := re.fullmatch(r"stem_bn(\d)", top):
                sd[f"features.norm{m.group(1)}.{kind}"] = w
            elif m := re.fullmatch(r"db(\d+)_l(\d+)_conv(\d)", top):
                sd[f"features.denseblock{int(m.group(1)) + 1}"
                   f".denselayer{int(m.group(2)) + 1}"
                   f".conv{m.group(3)}.weight"] = _oihw(w)
            elif m := re.fullmatch(r"db(\d+)_l(\d+)_bn(\d)", top):
                sd[f"features.denseblock{int(m.group(1)) + 1}"
                   f".denselayer{int(m.group(2)) + 1}"
                   f".norm{m.group(3)}.{kind}"] = w
            elif m := re.fullmatch(r"tr(\d+)_conv", top):
                sd[f"features.transition{int(m.group(1)) + 1}.conv.weight"] \
                    = _oihw(w)
            elif m := re.fullmatch(r"tr(\d+)_bn", top):
                sd[f"features.transition{int(m.group(1)) + 1}.norm.{kind}"] \
                    = w
            elif top == "final_bn":
                sd[f"features.norm5.{kind}"] = w
            elif top == "head":
                sd["classifier." + ("weight" if path[1] == "kernel"
                                    else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"densenet export: unmapped {path}")
    return sd


def export_ghostnet_state_dict(
        variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax GhostNet v1/v2 tree (+batch_stats) -> timm GhostNet
    state_dict (reference ghostnet.py:586-655 trunk naming; see
    convert_ghostnet_state_dict for the layout)."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        _GHOST_STAGE_OFFSET,
    )

    ghost_sub = {"primary": "primary_conv", "cheap": "cheap_operation"}
    short_idx = {("short1", "conv"): "0", ("short1", "bn"): "1",
                 ("short2", "conv"): "2", ("short2", "bn"): "3",
                 ("short3", "conv"): "4", ("short3", "bn"): "5"}
    sd: Dict[str, np.ndarray] = {}
    # timm's last stage (ConvBnAct) index = max bottleneck stage + 1
    final_si = 1 + max(
        (int(m.group(1)) for k in variables["params"]
         if (m := re.fullmatch(r"b(\d+)_\d+", k))), default=-1)
    for coll in ("params", "batch_stats"):
        for path, w in _flatten(variables.get(coll, {})).items():
            top = path[0]
            kind = _NORM_T.get(path[-1], path[-1])
            if top == "stem":
                if path[1] == "conv":
                    sd["conv_stem.weight"] = _oihw(w)
                else:
                    sd[f"bn1.{kind}"] = w
            elif top == "final_conv":
                if path[1] == "conv":
                    sd[f"blocks.{final_si}.0.conv.weight"] = _oihw(w)
                else:
                    sd[f"blocks.{final_si}.0.bn1.{kind}"] = w
            elif m := re.fullmatch(r"b(\d+)_(\d+)", top):
                si, li = int(m.group(1)), int(m.group(2))
                pre = f"blocks.{si}.{li - _GHOST_STAGE_OFFSET[si]}."
                mod = path[1]
                if mod in ("ghost1", "ghost2"):
                    sub = path[2]
                    if sub in ghost_sub:
                        if path[3] == "conv":
                            sd[pre + f"{mod}.{ghost_sub[sub]}.0.weight"] = \
                                _oihw(w)
                        else:
                            sd[pre + f"{mod}.{ghost_sub[sub]}.1.{kind}"] = w
                    else:  # short1/2/3 -> short_conv.{0-5}
                        which = short_idx[(sub, path[3])]
                        if path[3] == "conv":
                            sd[pre + f"{mod}.short_conv.{which}.weight"] = \
                                _oihw(w)
                        else:
                            sd[pre + f"{mod}.short_conv.{which}.{kind}"] = w
                elif mod == "dw":
                    if path[2] == "conv":
                        sd[pre + "conv_dw.weight"] = _oihw(w)
                    else:
                        sd[pre + f"bn_dw.{kind}"] = w
                elif mod in ("se_reduce", "se_expand"):
                    sd[pre + f"se.conv_{mod.split('_')[1]}."
                       + ("weight" if path[2] == "kernel" else "bias")] = \
                        _oihw(w) if path[2] == "kernel" else w
                elif mod in ("shortcut_dw", "shortcut_pw"):
                    base = 0 if mod == "shortcut_dw" else 2
                    if path[2] == "conv":
                        sd[pre + f"shortcut.{base}.weight"] = _oihw(w)
                    else:
                        sd[pre + f"shortcut.{base + 1}.{kind}"] = w
                else:
                    raise ValueError(f"ghostnet export: unmapped {path}")
            elif top == "conv_head":
                if path[1] == "kernel":  # Dense == post-pool 1x1 conv
                    sd["conv_head.weight"] = w.T[:, :, None, None]
                else:
                    sd["conv_head.bias"] = w
            elif top == "classifier":
                sd["classifier." + ("weight" if path[1] == "kernel"
                                    else "bias")] = \
                    w.T if path[1] == "kernel" else w
            else:
                raise ValueError(f"ghostnet export: unmapped {path}")
    return sd


def export_metaformer_state_dict(
        variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Our flax MetaFormer tree -> timm state_dict (inverse of
    torch_compat.convert_metaformer_state_dict).

    MLP fc weights export as 1x1 convs in conv-mixer stages (timm
    use_nchw) and as Linears in attention stages — which form a block uses
    is recovered from whether it carries mix_qkv. StarReLU scalars
    re-expand () -> (1,)."""
    params = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(params).items():
        top = path[0]
        if top == "downsample_0":
            sd["stem.conv." + ("weight" if path[1] == "kernel"
                               else "bias")] = \
                _oihw(w) if path[1] == "kernel" else w
        elif top == "downsample_0_norm":
            sd["stem.norm.weight"] = w
        elif m := re.match(r"downsample_(\d+)_norm$", top):
            sd[f"stages.{m.group(1)}.downsample.norm.weight"] = w
        elif m := re.match(r"downsample_(\d+)$", top):
            sd[f"stages.{m.group(1)}.downsample.conv."
               + ("weight" if path[1] == "kernel" else "bias")] = \
                _oihw(w) if path[1] == "kernel" else w
        elif m := re.match(r"stages_(\d+)_blocks_(\d+)$", top):
            pre = f"stages.{m.group(1)}.blocks.{m.group(2)}."
            attn = "mix_qkv" in params[top]
            mod = path[1]
            if mod in ("norm1", "norm2"):
                sd[pre + f"{mod}." + ("weight" if path[2] == "scale"
                                      else "bias")] = w
            elif m2 := re.match(r"(ls|rs)(\d)$", mod):
                tag = "layer_scale" if m2.group(1) == "ls" else "res_scale"
                sd[pre + f"{tag}{m2.group(2)}.scale"] = w
            elif m2 := re.match(r"mix_pw(\d)$", mod):
                sd[pre + f"token_mixer.pwconv{m2.group(1)}.weight"] = \
                    w.T[:, :, None, None]
            elif mod == "mix_dw":
                sd[pre + "token_mixer.dwconv.weight"] = _oihw(w)
            elif mod == "mix_act":
                sd[pre + f"token_mixer.act1.{path[2]}"] = w.reshape(1)
            elif mod == "mix_qkv":
                sd[pre + "token_mixer.qkv.weight"] = w.T
            elif mod == "mix_proj":
                sd[pre + "token_mixer.proj.weight"] = w.T
            elif m2 := re.match(r"mlp_fc(\d)$", mod):
                if path[2] == "kernel":
                    wt = w.T
                    sd[pre + f"mlp.fc{m2.group(1)}.weight"] = \
                        wt if attn else wt[:, :, None, None]
                else:
                    sd[pre + f"mlp.fc{m2.group(1)}.bias"] = w
            elif mod == "mlp_act":
                sd[pre + f"mlp.act.{path[2]}"] = w.reshape(1)
            else:
                raise ValueError(f"metaformer export: unmapped {path}")
        elif top == "norm":
            sd["head.norm." + ("weight" if path[1] == "scale"
                               else "bias")] = w
        elif top == "head":
            sd["head.fc." + ("weight" if path[1] == "kernel" else "bias")] \
                = w.T if path[1] == "kernel" else w
        elif m := re.match(r"head_fc(\d)$", top):
            sd[f"head.fc.fc{m.group(1)}."
               + ("weight" if path[1] == "kernel" else "bias")] = \
                w.T if path[1] == "kernel" else w
        elif top == "head_norm":
            sd["head.fc.norm." + ("weight" if path[1] == "scale"
                                  else "bias")] = w
        else:
            raise ValueError(f"metaformer export: unmapped {path}")
    return sd


_EXPORTERS = {
    "vit": export_vit_state_dict,
    "convnext": export_convnext_state_dict,
    "resnet": export_resnet_state_dict,
    "swin": export_swin_state_dict,
    "efficientnet": export_efficientnet_state_dict,
    "mobilenetv3": export_mobilenetv3_state_dict,
    "mixer": export_mixer_state_dict,
    "regnet": export_regnet_state_dict,
    "beit": export_beit_state_dict,
    "cait": export_cait_state_dict,
    "xcit": export_xcit_state_dict,
    "pvt2": export_pvt2_state_dict,
    "swinv2": export_swinv2_state_dict,
    "eva": export_eva_state_dict,
    "vgg": export_vgg_state_dict,
    "densenet": export_densenet_state_dict,
    "ghostnet": export_ghostnet_state_dict,
    "resnetv2": export_resnetv2_state_dict,
    "maxxvit": export_maxxvit_state_dict,
    "metaformer": export_metaformer_state_dict,
}


def export_torch_state_dict(variables: Dict[str, Any],
                            arch: Optional[str] = None,
                            **kw) -> Dict[str, np.ndarray]:
    """Flax variables ({'params', optional 'batch_stats'}) or a bare params
    tree -> timm-named numpy state dict. arch in {vit, convnext, resnet,
    swin, efficientnet, mobilenetv3, mixer, regnet}; inferred from the tree
    if omitted. Extra kwargs go to the family exporter (e.g. regnet's
    avg_down)."""
    if "params" not in variables:
        variables = {"params": variables}
    arch = arch or detect_flax_architecture(variables["params"])
    try:
        fn = _EXPORTERS[arch]
    except KeyError:
        raise ValueError(f"unknown export arch {arch!r}; "
                         f"known {sorted(_EXPORTERS)}") from None
    return fn(variables, **kw)


def save_torch_checkpoint(path: str, variables: Dict[str, Any],
                          arch: Optional[str] = None,
                          extra: Optional[Dict[str, Any]] = None,
                          **kw) -> None:
    """torch.save a reference-compatible checkpoint: {'model': state_dict,
    **extra}. Loadable by the reference's --finetune/--resume
    (utils/__init__.py:550-596) and by timm's load_state_dict."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(variables, arch, **kw).items()}
    torch.save({"model": sd, **(extra or {})}, path)
