"""Load reference torch checkpoints into the Flax models.

The reference fine-tunes from `.pth` pickles with timm state_dict naming
(reference main.py:232-238 --finetune, utils/__init__.py:550-596
load_state_dict; checkpoint dict keys model/optimizer/epoch per
utils/__init__.py:710-722). These converters map that naming onto our
param trees so users can migrate checkpoints without retraining.
Families: ViT/DeiT (incl. dist token), ConvNeXt, ResNet (+SE/ECA/deep-stem
variants, BatchNorm running stats -> the flax 'batch_stats' collection),
Swin (incl. the PatchMerging channel-order permutation), EfficientNet
superfamily, MobileNetV3/LCNet, MLP-Mixer family, RegNet X/Y/V/Z, BEiT v1/v2, CaiT, XCiT,
PVTv2, SwinV2, ConvNeXt-V2, EVA/EVA-02, VGG, DenseNet, GhostNet v1/v2,
ResNetV2/BiT, MaxxVit (maxvit/coatnet/maxxvit).
Architecture is auto-detected from the state-dict key shapes.

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
        elif m := re.match(r"patch_embed\.norm\.(weight|bias)", name):
            # embed_norm (aimv2; reference embed_norm_layer)
            put(("patch_embed", "norm",
                 "scale" if m.group(1) == "weight" else "bias"), w)
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
            elif m2 := re.match(r"attn\.(q_norm|k_norm|norm)\.(weight|bias)",
                                rest):
                put((blk, "attn", m2.group(1),
                     "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"mlp\.norm\.(weight|bias)", rest):
                # scale_mlp_norm (beit3 remaps)
                put((blk, "mlp", "norm",
                     "scale" if m2.group(1) == "weight" else "bias"), w)
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
        elif name == "attn_pool.latent":
            put(("attn_pool", "latent"), w)
        elif m := re.match(r"attn_pool\.(q|kv|proj|mlp\.fc1|mlp\.fc2)"
                           r"\.(weight|bias)", name):
            sub, kind = m.group(1).split("."), m.group(2)
            put(("attn_pool", *sub, "kernel" if kind == "weight" else "bias"),
                w.T if kind == "weight" else w)
        elif m := re.match(r"attn_pool\.norm\.(weight|bias)", name):
            put(("attn_pool", "norm",
                 "scale" if m.group(1) == "weight" else "bias"), w)
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
                    # conv_mlp variants store 1x1 Conv2d weights (O,I,1,1)
                    put((blk, tgt, "kernel"),
                        w[:, :, 0, 0].T if w.ndim == 4 else w.T)
                else:
                    put((blk, tgt, "bias"), w)
            elif m2 := re.match(r"mlp\.grn\.(weight|bias)", rest):
                # ConvNeXt-V2 GlobalResponseNorm (weight=gamma, bias=beta)
                put((blk, "grn_gamma" if m2.group(1) == "weight"
                     else "grn_beta"), w.reshape(-1))
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


def _put_in(tree: Dict[str, Any], path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO."""
    return w.transpose(2, 3, 1, 0)


def convert_resnetv2_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm ResNetV2/BiT state_dict -> {'params', 'batch_stats'}
    (models/resnetv2.py).

    timm naming (reference resnetv2.py:455-612): `stem.conv` (7x7,
    weight-standardized for the BiT variants) or `stem.conv1-3`/`stem.norm1-2`
    deep stems; `stages.{s}.blocks.{b}.{norm1..3,conv1..3,downsample.conv}`
    pre-activation bottlenecks (norm first; the projection is taken from the
    pre-activated input and carries NO norm in the preact models, reference
    resnetv2.py:314-341); final top-level `norm`; conv-classifier `head.fc`
    (ClassifierHead use_conv=True, reference resnetv2.py:604-610).
    GroupNormAct (BiT) has no running stats; the BN variants'
    running_mean/var land in 'batch_stats'. FRN's tau and EvoNormS0's v
    pass through under their own names.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(path, kind, w):
        if kind == "weight":
            _put_in(params, path + ("scale",), w)
        elif kind == "running_mean":
            _put_in(stats, path + ("mean",), w)
        elif kind == "running_var":
            _put_in(stats, path + ("var",), w)
        else:  # bias, frn tau, evonorm v
            _put_in(params, path + (kind,), w)

    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if name == "stem.conv.weight":
            _put_in(params, ("stem_conv", "kernel"), _conv_hwio(w))
        elif m := re.match(r"stem\.conv(\d)\.weight$", name):
            _put_in(params, (f"stem_conv{int(m.group(1)) - 1}", "kernel"),
                    _conv_hwio(w))
        elif m := re.match(r"stem\.norm(\d)\.(.+)", name):
            put_norm((f"stem_norm{int(m.group(1)) - 1}",), m.group(2), w)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.conv(\d)"
                           r"\.weight$", name):
            _put_in(params, (f"stages_{m.group(1)}_blocks_{m.group(2)}",
                             f"conv{m.group(3)}", "kernel"), _conv_hwio(w))
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.norm(\d)\.(.+)",
                           name):
            put_norm((f"stages_{m.group(1)}_blocks_{m.group(2)}",
                      f"norm{m.group(3)}"), m.group(4), w)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.downsample\.conv"
                           r"\.weight$", name):
            _put_in(params, (f"stages_{m.group(1)}_blocks_{m.group(2)}",
                             "downsample", "kernel"), _conv_hwio(w))
        elif m := re.match(r"norm\.(.+)", name):
            put_norm(("norm",), m.group(1), w)
        elif m := re.match(r"head\.fc\.(weight|bias)$", name):
            if m.group(1) == "weight":
                _put_in(params, ("head", "kernel"), w[:, :, 0, 0].T)
            else:
                _put_in(params, ("head", "bias"), w)
        else:
            log.warning("unmapped resnetv2 param %s (shape %s)",
                        name, w.shape)
    return {"params": params, "batch_stats": stats}


def _qkv_headfirst_to_3hd(w: np.ndarray, dim_head: int = 32) -> np.ndarray:
    """Reorder fused-qkv output rows from timm's head-first layout
    (heads, 3, dim_head — reference maxxvit.py Attention2d/AttentionCl
    forward with head_first=True) to our (3, heads, dim_head) layout.
    Works on (R, C) weights and (R,) biases; identity when heads == 1."""
    r = w.shape[0]
    heads = max(1, r // 3 // dim_head)
    hd = r // 3 // heads
    idx = np.arange(r).reshape(heads, 3, hd).transpose(1, 0, 2).reshape(-1)
    return w[idx]


def convert_maxxvit_state_dict(sd: Dict[str, Any],
                               dim_head: int = 32) -> Dict[str, Any]:
    """timm MaxxVit (maxvit/coatnet/maxxvit) state_dict ->
    {'params', 'batch_stats'} (models/maxvit.py).

    timm naming (reference maxxvit.py:1289-1382): `stem.{conv1,norm1,conv2}`;
    `stages.{s}.blocks.{b}.` with four block shapes — MBConv/ConvNeXt under
    `conv.`, MaxVit window+grid attention under `attn_block.`/`attn_grid.`,
    parallel attention under `attn.attn_block.`/`attn.attn_grid.`, and flat
    CoAtNet TransformerBlock2d (`norm1[.norm]`, `shortcut.expand`,
    `attn.{qkv,rel_pos,proj}` as 1x1 convs, `mlp.fc*` ConvMlp); head is
    either top-level `norm` + `head.fc` or NormMlp (`head.norm`,
    `head.pre_logits.fc`, `head.fc`).

    qkv rows are re-ordered from head-first to (3, heads, dim_head) unless
    the checkpoint is a tf variant (detected from the transposed
    `relative_position_bias_table` orientation — RelPosBiasTf stores
    (heads, L), RelPosBias (L, heads); tf models also use
    head_first=False so no row permutation applies)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # Global layout detection from rel-pos table orientation. heads vary
    # across stages while the table length L=(2p-1)^2 is shared, so the
    # axis with MORE distinct sizes across tables is the heads axis;
    # tie-break on a single table by L > heads (true at any real
    # resolution: L=169 at 224px).
    shapes = [tuple(_t(v).shape) for k, v in sd.items()
              if k.endswith("relative_position_bias_table")]
    if shapes:
        d0 = len({s[0] for s in shapes})
        d1 = len({s[1] for s in shapes})
        if d0 != d1:
            tf_tables = d0 > d1  # heads (varying) first => RelPosBiasTf
        else:
            tf_tables = shapes[0][0] < shapes[0][1]
        head_first = not tf_tables
    else:
        tf_tables, head_first = False, True  # rel_pos='mlp' models are rw

    def put_norm(path, kind, w):
        if kind == "weight":
            _put_in(params, path + ("scale",), w)
        elif kind == "running_mean":
            _put_in(stats, path + ("mean",), w)
        elif kind == "running_var":
            _put_in(stats, path + ("var",), w)
        else:
            _put_in(params, path + (kind,), w)

    def put_dense(path, kind, w, qkv=False):
        """torch Linear OR 1x1 Conv2d -> flax Dense kernel/bias."""
        if kind == "weight":
            if w.ndim == 4:
                w = w[:, :, 0, 0]
            if qkv and head_first:
                w = _qkv_headfirst_to_3hd(w, dim_head)
            _put_in(params, path + ("kernel",), w.T)
        else:
            if qkv and head_first:
                w = _qkv_headfirst_to_3hd(w, dim_head)
            _put_in(params, path + ("bias",), w)

    def put_relpos(base, rest, w):
        # base: flax rel_pos module path tuple; rest: timm sub-key
        if rest == "relative_position_bias_table":
            if tf_tables:  # tf (heads, L) -> (L, heads)
                w = w.T
            _put_in(params, base + ("rel_pos_table",), w)
        elif m := re.match(r"mlp\.fc(1|2)\.(weight|bias)", rest):
            put_dense(base + (f"fc{m.group(1)}",), m.group(2), w)
        else:
            log.warning("unmapped maxxvit rel_pos key %s under %s",
                        rest, base)

    def put_attn_cl(base, rest, w):
        """AttentionCl / PartitionAttentionCl sub-keys -> flax module
        children at `base` (names norm1/qkv/rel_pos/proj/ls1/...)."""
        if m := re.match(r"norm(\d)\.(.+)", rest):
            put_norm(base + (f"norm{m.group(1)}",), m.group(2), w)
        elif m := re.match(r"attn\.qkv\.(weight|bias)", rest):
            put_dense(base + ("qkv",), m.group(1), w, qkv=True)
        elif m := re.match(r"attn\.proj\.(weight|bias)", rest):
            put_dense(base + ("proj",), m.group(1), w)
        elif m := re.match(r"attn\.rel_pos\.(.+)", rest):
            put_relpos(base + ("rel_pos",), m.group(1), w)
        elif m := re.match(r"ls(\d)\.gamma", rest):
            _put_in(params, base + (f"ls{m.group(1)}",), w)
        elif m := re.match(r"mlp\.fc(1|2)\.(weight|bias)", rest):
            put_dense(base + (f"mlp_fc{m.group(1)}",), m.group(2), w)
        else:
            log.warning("unmapped maxxvit attn key %s under %s", rest, base)

    def put_conv_block(pre, rest, w):
        """MBConv / ConvNeXt sub-keys (timm `conv.`) -> flat flax names
        `{pre}_conv_*`."""
        conv_map = {"conv1_1x1": "conv1", "conv2_kxk": "conv2_dw",
                    "conv3_1x1": "conv3", "conv_dw": "dw"}
        if m := re.match(r"(conv1_1x1|conv2_kxk|conv3_1x1|conv_dw)"
                         r"\.(weight|bias)", rest):
            tgt = f"{pre}_conv_{conv_map[m.group(1)]}"
            _put_in(params, (tgt, "kernel" if m.group(2) == "weight"
                             else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif m := re.match(r"pre_norm\.(.+)", rest):
            put_norm((f"{pre}_conv_prenorm",), m.group(1), w)
        elif m := re.match(r"norm(\d?)\.(.+)", rest):
            put_norm((f"{pre}_conv_norm{m.group(1)}",), m.group(2), w)
        elif m := re.match(r"(?:se|se_early)\.fc(1|2)\.(weight|bias)", rest):
            _put_in(params, (f"{pre}_conv_se_fc{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif m := re.match(r"shortcut(?:\.expand)?\.(weight|bias)", rest):
            _put_in(params, (f"{pre}_conv_short",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(1) == "weight" else w)
        elif m := re.match(r"mlp\.fc(1|2)\.(weight|bias)", rest):
            # ConvNeXt block ConvMlp: 1x1 convs in both frameworks
            _put_in(params, (f"{pre}_conv_mlp{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif rest == "ls.gamma":
            params[f"{pre}_conv_ls"] = w
        else:
            log.warning("unmapped maxxvit conv key %s under %s", rest, pre)

    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if m := re.match(r"stem\.conv(\d)\.(weight|bias)", name):
            _put_in(params, (f"stem_conv{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif m := re.match(r"stem\.norm1\.(.+)", name):
            put_norm(("stem_norm1",), m.group(1), w)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", name):
            pre = f"s{m.group(1)}_b{m.group(2)}"
            rest = m.group(3)
            if m2 := re.match(r"conv\.(.+)", rest):
                put_conv_block(pre, m2.group(1), w)
            elif m2 := re.match(r"attn_(block|grid)\.(.+)", rest):
                sub = "win" if m2.group(1) == "block" else "grid"
                put_attn_cl((f"{pre}_{sub}",), m2.group(2), w)
            elif m2 := re.match(r"attn\.(norm\d|ls\d\.gamma|mlp\.fc\d\."
                                r"(?:weight|bias))(.*)", rest):
                # ParallelMaxxVitBlock: shared norm/ls/mlp under `attn.`
                put_attn_cl((f"{pre}_pm",), m2.group(1) + m2.group(2), w)
            elif m2 := re.match(r"attn\.attn_(block|grid)\.(.+)", rest):
                sub = "win" if m2.group(1) == "block" else "grid"
                r2 = m2.group(2)
                if m3 := re.match(r"qkv\.(weight|bias)", r2):
                    put_dense((f"{pre}_pm", f"qkv_{sub}"), m3.group(1), w,
                              qkv=True)
                elif m3 := re.match(r"proj\.(weight|bias)", r2):
                    put_dense((f"{pre}_pm", f"proj_{sub}"), m3.group(1), w)
                elif m3 := re.match(r"rel_pos\.(.+)", r2):
                    put_relpos((f"{pre}_pm", f"rel_pos_{sub}"),
                               m3.group(1), w)
                else:
                    log.warning("unmapped maxxvit pm key %s", name)
            # CoAtNet TransformerBlock2d (flat)
            elif m2 := re.match(r"norm1\.norm\.(.+)", rest):
                put_norm((f"{pre}_norm1",), m2.group(1), w)
            elif m2 := re.match(r"norm(\d)\.(.+)", rest):
                put_norm((f"{pre}_norm{m2.group(1)}",), m2.group(2), w)
            elif m2 := re.match(r"shortcut\.expand\.(weight|bias)", rest):
                put_dense((f"{pre}_short",), m2.group(1), w)
            elif m2 := re.match(r"attn\.qkv\.(weight|bias)", rest):
                put_dense((f"{pre}_qkv",), m2.group(1), w, qkv=True)
            elif m2 := re.match(r"attn\.proj\.(weight|bias)", rest):
                put_dense((f"{pre}_proj",), m2.group(1), w)
            elif m2 := re.match(r"attn\.rel_pos\.(.+)", rest):
                put_relpos((f"{pre}_rel_pos",), m2.group(1), w)
            elif m2 := re.match(r"ls(\d)\.gamma", rest):
                params[f"{pre}_ls{m2.group(1)}"] = w
            elif m2 := re.match(r"mlp\.fc(1|2)\.(weight|bias)", rest):
                put_dense((f"{pre}_mlp{m2.group(1)}",), m2.group(2), w)
            else:
                log.warning("unmapped maxxvit block key %s", name)
        elif m := re.match(r"norm\.(.+)", name):
            put_norm(("final_norm",), m.group(1), w)
        elif m := re.match(r"head\.norm\.(.+)", name):
            put_norm(("head_norm",), m.group(1), w)
        elif m := re.match(r"head\.pre_logits\.fc\.(weight|bias)", name):
            put_dense(("head_pre_logits",), m.group(1), w)
        elif m := re.match(r"head\.fc\.(weight|bias)", name):
            put_dense(("classifier",), m.group(1), w)
        else:
            log.warning("unmapped maxxvit param %s (shape %s)",
                        name, w.shape)
    return {"params": params, "batch_stats": stats}


def convert_resnet_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm ResNet state_dict -> {'params', 'batch_stats'} (models/resnet.py).

    Covers the whole registered surface's naming: plain 7x7 stem (conv1/bn1,
    reference models/resnet.py:506-507), deep 3-conv stems (conv1.{0,3,6}
    convs + conv1.{1,4} norms, :495-502), replace_stem_pool (maxpool.0 conv +
    maxpool.1 norm, :512-519), layer{1-4}.{B} blocks (conv1-3/bn1-3,
    downsample.{conv,bn} at any Sequential index — avg-pool 'd' variants
    shift them), SE (se.fc1/fc2) and ECA (se.conv) attention, fc head.
    BatchNorm running stats land in 'batch_stats' (flax collection);
    GroupNorm variants simply have none.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    deep_stem = "conv1.0.weight" in sd

    def put_norm(dst, kind, w):
        if kind == "weight":
            _put_in(params, (*dst, "norm", "scale"), w)
        elif kind == "bias":
            _put_in(params, (*dst, "norm", "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (*dst, "norm", "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (*dst, "norm", "var"), w)

    deep_conv = {"0": "stem_conv1", "3": "stem_conv2", "6": "stem_conv3"}
    deep_bn = {"1": "stem_bn1", "4": "stem_bn2"}
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if (m := re.match(r"conv1\.(\d)\.weight", name)) \
                and m.group(1) in deep_conv:  # conv1.{1,4}.weight is a norm's
            _put_in(params, (deep_conv[m.group(1)], "kernel"), _conv_hwio(w))
        elif m := re.match(r"conv1\.(\d)\.(weight|bias|running_mean|running_var)", name):
            put_norm((deep_bn[m.group(1)],), m.group(2), w)
        elif name == "conv1.weight":
            _put_in(params, ("stem_conv", "kernel"), _conv_hwio(w))
        elif m := re.match(r"bn1\.(weight|bias|running_mean|running_var)", name):
            put_norm(("stem_bn3" if deep_stem else "stem_bn",), m.group(1), w)
        elif m := re.match(r"maxpool\.\d\.(.+)", name):
            rest = m.group(1)
            if rest == "weight" and w.ndim == 4:
                _put_in(params, ("stem_pool_conv", "kernel"), _conv_hwio(w))
            else:
                put_norm(("stem_pool_bn",), rest, w)
        elif m := re.match(r"layer(\d+)\.(\d+)\.(.+)", name):
            blk = f"stages_{int(m.group(1)) - 1}_blocks_{m.group(2)}"
            rest = m.group(3)
            if m2 := re.match(r"conv(\d)\.weight", rest):
                _put_in(params, (blk, f"conv{m2.group(1)}", "kernel"),
                        _conv_hwio(w))
            elif m2 := re.match(r"bn(\d)\.(weight|bias|running_mean|running_var)", rest):
                put_norm((blk, f"bn{m2.group(1)}"), m2.group(2), w)
            elif m2 := re.match(r"downsample\.\d\.(.+)", rest):
                kind = m2.group(1)
                if kind == "weight" and w.ndim == 4:
                    _put_in(params, (blk, "downsample_conv", "kernel"),
                            _conv_hwio(w))
                else:
                    put_norm((blk, "downsample_bn"), kind, w)
            elif m2 := re.match(r"se\.fc1\.(weight|bias)", rest):
                _put_in(params, (blk, "attn_se_reduce",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        _conv_hwio(w) if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"se\.fc2\.(weight|bias)", rest):
                _put_in(params, (blk, "attn_se_expand",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        _conv_hwio(w) if m2.group(1) == "weight" else w)
            elif rest == "se.conv.weight":
                # ECA Conv1d (1, 1, k) -> flax Conv kernel (k, 1, 1)
                _put_in(params, (blk, "attn_eca_conv", "kernel"),
                        w.transpose(2, 1, 0))
            else:
                log.warning("unmapped resnet block param %s", name)
        elif m := re.match(r"fc\.(weight|bias)", name):
            _put_in(params, ("head", "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped resnet param %s (shape %s)", name, w.shape)
    return {"params": params, "batch_stats": stats}


def convert_efficientnet_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm EfficientNet-superfamily state_dict -> {'params', 'batch_stats'}.

    Covers the arch-string builder surface (models/effnet_builder.py;
    reference _efficientnet_builder.py + efficientnet_blocks.py naming):
    conv_stem/bn1, blocks.S.B with DepthwiseSeparable (conv_dw/bn1/conv_pw/
    bn2), InvertedResidual (conv_pw/bn1/conv_dw/bn2/conv_pwl/bn3),
    EdgeResidual (conv_exp/bn1/conv_pwl/bn2), ConvBnAct (conv/bn1), SE
    (se.conv_reduce/se.conv_expand), conv_head/bn2, classifier. The timm
    bnN indices are block-type relative, so the type is inferred per block
    from its key set before mapping. Applies to efficientnet b0-b8/v2/lite,
    mnasnet, mobilenetv2, tinynet, lcnet, tf_ variants — all share this
    builder naming on both sides.
    """
    from collections import defaultdict

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(dst, kind, w):
        if kind == "weight":
            _put_in(params, (*dst, "norm", "scale"), w)
        elif kind == "bias":
            _put_in(params, (*dst, "norm", "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (*dst, "norm", "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (*dst, "norm", "var"), w)

    blocks: Dict[tuple, Dict[str, Any]] = defaultdict(dict)
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if name == "conv_stem.weight":
            _put_in(params, ("stem_conv", "conv", "kernel"), _conv_hwio(w))
        elif m := re.match(r"bn1\.(weight|bias|running_mean|running_var)", name):
            put_norm(("stem_norm",), m.group(1), w)
        elif name == "conv_head.weight":
            _put_in(params, ("head_conv", "conv", "kernel"), _conv_hwio(w))
        elif name == "conv_head.bias":  # mobilenetv3-style norm-free head
            _put_in(params, ("head_conv", "conv", "bias"), w)
        elif m := re.match(r"bn2\.(weight|bias|running_mean|running_var)", name):
            put_norm(("head_norm",), m.group(1), w)
        elif m := re.match(r"classifier\.(weight|bias)", name):
            _put_in(params, ("classifier",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        elif m := re.match(r"blocks\.(\d+)\.(\d+)\.(.+)", name):
            blocks[(int(m.group(1)), int(m.group(2)))][m.group(3)] = w
        else:
            log.warning("unmapped efficientnet param %s (shape %s)",
                        name, w.shape)

    for (s, b), names in blocks.items():
        pre = f"s{s}_b{b}"
        if any(k.startswith("conv_pwl.") for k in names):
            if any(k.startswith("conv_dw.") for k in names):  # InvertedResidual
                table = {"conv_pw": "pw_exp", "bn1": "pw_exp_norm",
                         "conv_dw": "dw", "bn2": "dw_norm",
                         "conv_pwl": "pw_proj", "bn3": "pw_proj_norm"}
            else:                                             # EdgeResidual
                table = {"conv_exp": "conv_exp", "bn1": "conv_exp_norm",
                         "conv_pwl": "pw_proj", "bn2": "pw_proj_norm"}
        elif any(k.startswith("conv_dw.") for k in names):    # DepthwiseSep
            table = {"conv_dw": "dw", "bn1": "dw_norm",
                     "conv_pw": "pw_proj", "bn2": "pw_proj_norm"}
        else:                                                 # ConvBnAct
            table = {"conv": "conv", "bn1": "norm"}
        for rest, w in names.items():
            if m := re.match(r"(conv(?:_pw|_pwl|_dw|_exp)?)\.weight", rest):
                _put_in(params, (f"{pre}_{table[m.group(1)]}",
                                 "conv", "kernel"), _conv_hwio(w))
            elif m := re.match(r"(bn\d)\.(weight|bias|running_mean|running_var)", rest):
                put_norm((f"{pre}_{table[m.group(1)]}",), m.group(2), w)
            elif m := re.match(r"se\.conv_(reduce|expand)\.(weight|bias)", rest):
                _put_in(params, (f"{pre}_se_{m.group(1)}",
                                 "kernel" if m.group(2) == "weight" else "bias"),
                        _conv_hwio(w) if m.group(2) == "weight" else w)
            else:
                log.warning("unmapped efficientnet block param blocks.%d.%d.%s",
                            s, b, rest)
    return {"params": params, "batch_stats": stats}


def convert_mobilenetv3_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm MobileNetV3/LCNet state_dict -> {'params', 'batch_stats'}
    (models/mobilenetv3.py).

    Same builder naming as efficientnet on the torch side, but our module
    uses a flat block index and a dedicated head: timm's trailing ConvBnAct
    block (the 960-ch cn stage) maps to head_conv/head_bn, the post-pool
    conv_head (with bias) to head_fc, and blocks.S.B renumber to blocks_N
    in (S, B) order. Block-type tables follow convert_efficientnet's
    inference (conv_pwl present => InvertedResidual).
    """
    from collections import defaultdict

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(dst, kind, w):
        # this module's BatchNorms are named directly (no .norm wrapper)
        if kind == "weight":
            _put_in(params, (dst[0], "scale"), w)
        elif kind == "bias":
            _put_in(params, (dst[0], "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (dst[0], "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (dst[0], "var"), w)

    blocks: Dict[tuple, Dict[str, Any]] = defaultdict(dict)
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if name == "conv_stem.weight":
            _put_in(params, ("stem_conv", "kernel"), _conv_hwio(w))
        elif m := re.match(r"bn1\.(weight|bias|running_mean|running_var)", name):
            put_norm(("stem_bn",), m.group(1), w)
        elif m := re.match(r"conv_head\.(weight|bias)", name):
            _put_in(params, ("head_fc",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(1) == "weight" else w)
        elif m := re.match(r"classifier\.(weight|bias)", name):
            _put_in(params, ("classifier",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        elif m := re.match(r"blocks\.(\d+)\.(\d+)\.(.+)", name):
            blocks[(int(m.group(1)), int(m.group(2)))][m.group(3)] = w
        else:
            log.warning("unmapped mobilenetv3 param %s (shape %s)",
                        name, w.shape)

    flat = 0
    for (s, b) in sorted(blocks):
        names = blocks[(s, b)]
        if any(k.startswith("conv.") for k in names):  # trailing cn = head
            for rest, w in names.items():
                if rest == "conv.weight":
                    _put_in(params, ("head_conv", "kernel"), _conv_hwio(w))
                elif m := re.match(r"bn1\.(weight|bias|running_mean|running_var)", rest):
                    put_norm(("head_bn",), m.group(1), w)
            continue
        pre = f"blocks_{flat}"
        flat += 1
        if any(k.startswith("conv_pwl.") for k in names):  # InvertedResidual
            table = {"conv_pw": "pw_exp", "bn1": "bn_exp",
                     "conv_dw": "dw", "bn2": "bn_dw",
                     "conv_pwl": "pw", "bn3": "bn_pw"}
        else:                                              # DepthwiseSep
            table = {"conv_dw": "dw", "bn1": "bn_dw",
                     "conv_pw": "pw", "bn2": "bn_pw"}
        for rest, w in names.items():
            if m := re.match(r"(conv(?:_pw|_pwl|_dw)?)\.weight", rest):
                _put_in(params, (f"{pre}_{table[m.group(1)]}", "kernel"),
                        _conv_hwio(w))
            elif m := re.match(r"(bn\d)\.(weight|bias|running_mean|running_var)", rest):
                put_norm((f"{pre}_{table[m.group(1)]}",), m.group(2), w)
            elif m := re.match(r"se\.conv_(reduce|expand)\.(weight|bias)", rest):
                _put_in(params, (f"{pre}_se_{m.group(1)}",
                                 "kernel" if m.group(2) == "weight" else "bias"),
                        _conv_hwio(w) if m.group(2) == "weight" else w)
            else:
                log.warning("unmapped mobilenetv3 block param blocks.%d.%d.%s",
                            s, b, rest)
    return {"params": params, "batch_stats": stats}


def _swin_merge_perm(four_c: int) -> np.ndarray:
    """Channel permutation for PatchMerging weights.

    The reference flattens the 2x2 neighborhood as (w_sub, h_sub, c)
    (reference swin_transformer.py:476 permute(0,1,3,4,2,5)); our merge
    flattens (h_sub, w_sub, c) (models/swin.py). perm[j] gives the timm
    channel feeding OUR channel j, applied to merge_norm params and the
    reduction kernel's input dim.
    """
    c = four_c // 4
    j = np.arange(four_c)
    h, rem = j // (2 * c), j % (2 * c)
    w_sub, ch = rem // c, rem % c
    return w_sub * 2 * c + h * c + ch


def convert_swin_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm SwinTransformer state_dict -> our flax params (models/swin.py).

    Naming (the reference vendors timm's swin_transformer.py):
    patch_embed.proj/norm, layers.L.blocks.B.{norm1,attn.qkv,attn.proj,
    attn.relative_position_bias_table,norm2,mlp.fc1,mlp.fc2},
    layers.L.downsample.{norm,reduction} (at the START of layers 1+,
    reference :706), norm, head.fc. Buffers (relative_position_index,
    attn_mask) are recomputed here, not loaded. PatchMerging channels are
    permuted to our (h_sub, w_sub, c) flatten order (see _swin_merge_perm).
    """
    params: Dict[str, Any] = {}

    for name, w in sd.items():
        if ("relative_position_index" in name or name.endswith("attn_mask")
                or name.endswith("num_batches_tracked")):
            continue
        w = _t(w)
        if name == "patch_embed.proj.weight":
            d, c, kh, kw = w.shape
            _put_in(params, ("patch_embed", "kernel"),
                    w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "patch_embed.proj.bias":
            _put_in(params, ("patch_embed", "bias"), w)
        elif m := re.match(r"patch_embed\.norm\.(weight|bias)", name):
            _put_in(params, ("patch_norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"layers\.(\d+)\.downsample\.norm\.(weight|bias)", name):
            perm = _swin_merge_perm(w.shape[0])
            _put_in(params, (f"merge_norm_{m.group(1)}",
                             "scale" if m.group(2) == "weight" else "bias"),
                    w[perm])
        elif m := re.match(r"layers\.(\d+)\.downsample\.reduction\.weight", name):
            perm = _swin_merge_perm(w.shape[1])
            _put_in(params, (f"merge_proj_{m.group(1)}", "kernel"),
                    w[:, perm].T)
        elif m := re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.+)", name):
            blk = f"stages_{m.group(1)}_blocks_{m.group(2)}"
            rest = m.group(3)
            if m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif rest == "attn.relative_position_bias_table":
                _put_in(params, (blk, "attn", "rel_pos_bias_table"), w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped swin block param %s", name)
        elif m := re.match(r"norm\.(weight|bias)", name):
            _put_in(params, ("norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"head\.(?:fc\.)?(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped swin param %s (shape %s)", name, w.shape)
    return params


def convert_mixer_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm MLP-Mixer/gMixer/ResMLP/gMLP state_dict -> our flax params
    (models/mlp_mixer.py).

    Reference models/mlp_mixer.py naming: stem.proj (conv), blocks.N with
    MixerBlock (norm1/mlp_tokens/norm2/mlp_channels :58-97), ResBlock
    (Affine norm1/norm2 alpha+beta, linear_tokens, ls1/ls2 :118-162), or
    SpatialGatingBlock (norm + GatedMlp fc1/gate.norm/gate.proj/fc2 —
    flattened here to fc1/gate_norm/gate_proj/fc2), final norm + head.
    """
    from collections import defaultdict

    params: Dict[str, Any] = {}
    blocks: Dict[str, Dict[str, Any]] = defaultdict(dict)

    for name, w in sd.items():
        w = _t(w)
        if name == "stem.proj.weight":
            d, c, kh, kw = w.shape
            _put_in(params, ("stem", "proj", "kernel"),
                    w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "stem.proj.bias":
            _put_in(params, ("stem", "proj", "bias"), w)
        elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
            blocks[m.group(1)][m.group(2)] = w
        elif m := re.match(r"norm\.(weight|bias)", name):
            _put_in(params, ("norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"norm\.(alpha|beta)", name):
            _put_in(params, (f"norm_{m.group(1)}",), w.reshape(-1))
        elif m := re.match(r"head\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped mixer param %s (shape %s)", name, w.shape)

    for i, names in blocks.items():
        blk = f"blocks_{i}"
        # gMLP's GatedMlp nests under mlp_channels but our block flattens it
        gmlp = any("gate." in k for k in names)
        for rest, w in names.items():
            if m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"(norm1|norm2)\.(alpha|beta)", rest):
                # ResMLP Affine: alpha/beta kept as flat block leaves
                _put_in(params, (blk, f"{m2.group(1)}_{m2.group(2)}"),
                        w.reshape(-1))
            elif m2 := re.match(r"(ls1|ls2)$", rest):
                _put_in(params, (blk, m2.group(1)), w.reshape(-1))
            elif m2 := re.match(r"linear_tokens\.(weight|bias)", rest):
                _put_in(params, (blk, "linear_tokens",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif gmlp and (m2 := re.match(
                    r"(?:mlp_channels\.)?fc(\d)\.(weight|bias)", rest)):
                _put_in(params, (blk, f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif gmlp and (m2 := re.match(
                    r"(?:mlp_channels\.)?gate\.norm\.(weight|bias)", rest)):
                _put_in(params, (blk, "gate_norm",
                                 "scale" if m2.group(1) == "weight" else "bias"), w)
            elif gmlp and (m2 := re.match(
                    r"(?:mlp_channels\.)?gate\.proj\.(weight|bias)", rest)):
                _put_in(params, (blk, "gate_proj",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"(mlp_tokens|mlp_channels)\.fc(\d)\.(weight|bias)", rest):
                # gMixer (GluMlp: fc1 out = 2x fc2 in) flattens the module
                # names with underscores in our tree; plain Mixer nests
                which = m2.group(1)
                fc1 = names.get(f"{which}.fc1.weight")
                fc2 = names.get(f"{which}.fc2.weight")
                glu = fc1 is not None and fc2 is not None \
                    and fc1.shape[0] != fc2.shape[1]
                dst = (blk, f"{which}_fc{m2.group(2)}") if glu \
                    else (blk, which, f"fc{m2.group(2)}")
                _put_in(params, (*dst,
                                 "kernel" if m2.group(3) == "weight" else "bias"),
                        w.T if m2.group(3) == "weight" else w)
            elif m2 := re.match(r"norm\.(weight|bias)", rest):
                _put_in(params, (blk, "norm",
                                 "scale" if m2.group(1) == "weight" else "bias"), w)
            else:
                log.warning("unmapped mixer block param blocks.%s.%s", i, rest)
    return params


def convert_beit_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm Beit state_dict -> our flax params tree (models/beit.py).

    Reference models/beit.py naming: bias-free fused attn.qkv with separate
    attn.q_bias/attn.v_bias (k bias is a non-persistent zero buffer,
    :133-137), per-block attn.relative_position_bias_table (+ index buffer,
    recomputed here), mandatory LayerScale as bare gamma_1/gamma_2
    Parameters (:304-305), mean-pool head behind fc_norm. Our flax Beit
    uses flat block-module names (blocks_{i}_attn etc.).
    """
    params: Dict[str, Any] = {}

    for name, w in sd.items():
        if ("relative_position_index" in name or name.endswith("attn.k_bias")
                or name.endswith("num_batches_tracked")):
            continue
        w = _t(w)
        if name == "cls_token":
            _put_in(params, ("cls_token",), w)
        elif name == "patch_embed.proj.weight":
            d, c, kh, kw = w.shape
            _put_in(params, ("patch_embed", "proj", "kernel"),
                    w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "patch_embed.proj.bias":
            _put_in(params, ("patch_embed", "proj", "bias"), w)
        elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
            i, rest = m.group(1), m.group(2)
            if m2 := re.match(r"gamma_(\d)", rest):
                _put_in(params, (f"blocks_{i}_ls{m2.group(1)}", "gamma"), w)
            elif m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (f"blocks_{i}_{m2.group(1)}",
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif rest == "attn.qkv.weight":
                _put_in(params, (f"blocks_{i}_attn", "qkv", "kernel"), w.T)
            elif m2 := re.match(r"attn\.(q_bias|v_bias)", rest):
                _put_in(params, (f"blocks_{i}_attn", m2.group(1)), w)
            elif rest == "attn.relative_position_bias_table":
                _put_in(params, (f"blocks_{i}_attn", "rel_pos_bias_table"), w)
            elif m2 := re.match(r"attn\.proj\.(weight|bias)", rest):
                _put_in(params, (f"blocks_{i}_attn", "proj",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (f"blocks_{i}_mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped beit block param %s", name)
        elif m := re.match(r"fc_norm\.(weight|bias)", name):
            _put_in(params, ("fc_norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"head\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped beit param %s (shape %s)", name, w.shape)
    return params


def convert_cait_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm Cait state_dict -> our flax params tree (models/cait.py).

    Reference models/cait.py naming: self-attention blocks.N with
    talking-heads attn (fused qkv + proj_l/proj_w head-mixing Linears,
    :132-135) and bare gamma_1/gamma_2 LayerScale Parameters (:195-196);
    class-attention blocks_token_only.N with separate q/k/v Linears
    (:39-43) and their own gamma_1/gamma_2 (:107-108); patch_embed.proj,
    pos_embed, cls_token, final norm + head. Our flax tree nests LayerScale
    as ls1/ls2 (gamma child) in self-attn blocks and keeps bare
    gamma1/gamma2 leaves in class-attn blocks; the head-mix Linears are
    (h, h) einsum kernels, transposed from torch's (out, in)."""
    params: Dict[str, Any] = {}

    for name, w in sd.items():
        w = _t(w)
        if name in ("cls_token", "pos_embed"):
            _put_in(params, (name,), w)
        elif name == "patch_embed.proj.weight":
            d, c, kh, kw = w.shape
            _put_in(params, ("patch_embed", "proj", "kernel"),
                    w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "patch_embed.proj.bias":
            _put_in(params, ("patch_embed", "proj", "bias"), w)
        elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
            blk, rest = f"blocks_{m.group(1)}", m.group(2)
            if m2 := re.match(r"gamma_(\d)", rest):
                _put_in(params, (blk, f"ls{m2.group(1)}", "gamma"), w)
            elif m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"attn\.(proj_l|proj_w)\.(weight|bias)", rest):
                leaf = ("kernel" if m2.group(2) == "weight" else "bias")
                _put_in(params, (blk, "attn", f"{m2.group(1)}_{leaf}"),
                        w.T if leaf == "kernel" else w)
            elif m2 := re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped cait block param %s", name)
        elif m := re.match(r"blocks_token_only\.(\d+)\.(.+)", name):
            blk, rest = f"blocks_token_only_{m.group(1)}", m.group(2)
            if m2 := re.match(r"gamma_(\d)", rest):
                _put_in(params, (blk, f"gamma{m2.group(1)}"), w)
            elif m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"attn\.(q|k|v|proj)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped cait token-only param %s", name)
        elif m := re.match(r"norm\.(weight|bias)", name):
            _put_in(params, ("norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"head\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped cait param %s (shape %s)", name, w.shape)
    return params


def convert_eva_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm Eva state_dict -> our flax params tree (models/eva.py).

    Reference models/eva.py attention comes in two layouts (:117-140 of
    the timm class): fused attn.qkv (bias-free) + separate q_bias/v_bias
    (k is a zero buffer) for tiny/small/rope-reg variants, or separate
    q_proj/k_proj/v_proj Linears for base/large. Both fold into our fused
    qkv Dense with a full bias (k part zero — a no-op under softmax). The
    MLP comes in three layouts (:260-286): SwiGLU (fc1_g/fc1_x/norm/fc2),
    fused GluMlp (fc1 with gate-first packed weights, :271-278), or plain
    Mlp — GluMlp splits into our fc1_g/fc1_x halves; plain maps to the
    block-level mlp_fc1/mlp_fc2. Bare gamma_1/gamma_2 LayerScale, optional
    norm_pre (Perception Encoder), post-pool fc_norm, and AttentionPoolLatent
    (latent/q/kv/proj/norm/mlp) all map name-for-name."""
    from collections import defaultdict

    params: Dict[str, Any] = {}
    blocks: Dict[str, Dict[str, Any]] = defaultdict(dict)

    for name, w in sd.items():
        if name.endswith("k_bias") or "rope" in name:
            continue
        w = _t(w)
        if name in ("cls_token", "reg_token", "pos_embed"):
            _put_in(params, (name,), w)
        elif name == "patch_embed.proj.weight":
            d, c, kh, kw = w.shape
            _put_in(params, ("patch_embed", "kernel"),
                    w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "patch_embed.proj.bias":
            _put_in(params, ("patch_embed", "bias"), w)
        elif m := re.match(r"(norm_pre|norm|fc_norm)\.(weight|bias)", name):
            _put_in(params, (m.group(1),
                             "scale" if m.group(2) == "weight" else "bias"), w)
        elif m := re.match(r"attn_pool\.(.+)", name):
            rest = m.group(1)
            if rest == "latent":
                _put_in(params, ("attn_pool", "latent"), w)
            elif m2 := re.match(r"(q|kv|proj)\.(weight|bias)", rest):
                _put_in(params, ("attn_pool", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"norm\.(weight|bias)", rest):
                _put_in(params, ("attn_pool", "norm",
                                 "scale" if m2.group(1) == "weight" else "bias"), w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, ("attn_pool", "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped eva attn_pool param %s", name)
        elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
            blocks[m.group(1)][m.group(2)] = w
        elif m := re.match(r"head\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped eva param %s (shape %s)", name, w.shape)

    for i, names in blocks.items():
        blk = f"blocks_{i}"
        # --- attention: fold either layout into fused qkv + full bias ---
        if "attn.qkv.weight" in names:
            qkv_w = names["attn.qkv.weight"]
            dim = qkv_w.shape[1]
            _put_in(params, (blk, "attn", "qkv", "kernel"), qkv_w.T)
            q_b = names.get("attn.q_bias", np.zeros(dim, qkv_w.dtype))
            v_b = names.get("attn.v_bias", np.zeros(dim, qkv_w.dtype))
            _put_in(params, (blk, "attn", "qkv", "bias"),
                    np.concatenate([q_b, np.zeros(dim, qkv_w.dtype), v_b]))
        elif "attn.q_proj.weight" in names:
            qw = names["attn.q_proj.weight"]
            dim = qw.shape[1]
            _put_in(params, (blk, "attn", "qkv", "kernel"),
                    np.concatenate([qw, names["attn.k_proj.weight"],
                                    names["attn.v_proj.weight"]]).T)
            z = np.zeros(dim, qw.dtype)
            _put_in(params, (blk, "attn", "qkv", "bias"),
                    np.concatenate([names.get("attn.q_proj.bias", z),
                                    names.get("attn.k_proj.bias", z),
                                    names.get("attn.v_proj.bias", z)]))
        # --- MLP: SwiGLU / fused GluMlp / plain ---
        swiglu = any(r.startswith("mlp.fc1_g.") for r in names)
        glu = False
        if "mlp.fc1.weight" in names:
            glu = (names["mlp.fc1.weight"].shape[0]
                   == 2 * names["mlp.fc2.weight"].shape[1])
        for rest, w in names.items():
            if rest in ("attn.qkv.weight", "attn.q_bias", "attn.v_bias",
                        "attn.q_proj.weight", "attn.q_proj.bias",
                        "attn.k_proj.weight", "attn.k_proj.bias",
                        "attn.v_proj.weight", "attn.v_proj.bias"):
                continue
            if m2 := re.match(r"gamma_(\d)", rest):
                _put_in(params, (blk, f"gamma_{m2.group(1)}"), w)
            elif m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"attn\.proj\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", "proj",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"attn\.(q_norm|k_norm)\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"mlp\.(fc1_g|fc1_x)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"mlp\.norm\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", "norm",
                                 "scale" if m2.group(1) == "weight" else "bias"), w)
            elif glu and (m2 := re.match(r"mlp\.fc1\.(weight|bias)", rest)):
                g, u = np.split(w, 2, axis=0)  # gate_last=False: gate first
                leaf = "kernel" if m2.group(1) == "weight" else "bias"
                _put_in(params, (blk, "mlp", "fc1_g", leaf),
                        g.T if leaf == "kernel" else g)
                _put_in(params, (blk, "mlp", "fc1_x", leaf),
                        u.T if leaf == "kernel" else u)
            elif (glu or swiglu) and (
                    m2 := re.match(r"mlp\.fc2\.(weight|bias)", rest)):
                _put_in(params, (blk, "mlp", "fc2",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, f"mlp_fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped eva block param blocks.%s.%s", i, rest)
    return params


def convert_swinv2_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm SwinTransformerV2 state_dict -> our flax params
    (models/swin_v2.py).

    Reference swin_transformer_v2.py naming: bias-free fused attn.qkv with
    separate q_bias/v_bias (:117-121, k is a zero buffer), per-head
    logit_scale (:108), continuous position bias MLP cpb_mlp.0/.2
    (:111-115), post-norm blocks, stage-leading PatchMerging
    downsample.reduction/norm (:480-494 — reduction BEFORE norm, flatten
    order (w_sub, h_sub, c) permuted to our (h_sub, w_sub, c) on the
    reduction input). Buffers (relative_coords_table,
    relative_position_index, k_bias) are recomputed here."""
    params: Dict[str, Any] = {}

    for name, w in sd.items():
        if ("relative_position_index" in name or "relative_coords_table"
                in name or name.endswith("k_bias")
                or name.endswith("num_batches_tracked")):
            continue
        w = _t(w)
        if name == "patch_embed.proj.weight":
            d, c, kh, kw = w.shape
            _put_in(params, ("patch_embed", "kernel"),
                    w.transpose(2, 3, 1, 0).reshape(kh * kw * c, d))
        elif name == "patch_embed.proj.bias":
            _put_in(params, ("patch_embed", "bias"), w)
        elif m := re.match(r"patch_embed\.norm\.(weight|bias)", name):
            _put_in(params, ("patch_norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"layers\.(\d+)\.downsample\.reduction\.weight", name):
            perm = _swin_merge_perm(w.shape[1])
            _put_in(params, (f"merge_proj_{m.group(1)}", "kernel"),
                    w[:, perm].T)
        elif m := re.match(r"layers\.(\d+)\.downsample\.norm\.(weight|bias)", name):
            # v2 norm runs AFTER the reduction (2C) — no permutation
            _put_in(params, (f"merge_norm_{m.group(1)}",
                             "scale" if m.group(2) == "weight" else "bias"), w)
        elif m := re.match(r"layers\.(\d+)\.blocks\.(\d+)\.(.+)", name):
            blk = f"stages_{m.group(1)}_blocks_{m.group(2)}"
            rest = m.group(3)
            if m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif rest == "attn.logit_scale":
                _put_in(params, (blk, "attn", "logit_scale"), w)
            elif m2 := re.match(r"attn\.(q_bias|v_bias)", rest):
                _put_in(params, (blk, "attn", m2.group(1)), w)
            elif rest == "attn.qkv.weight":
                _put_in(params, (blk, "attn", "qkv", "kernel"), w.T)
            elif m2 := re.match(r"attn\.cpb_mlp\.0\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", "cpb_fc1",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif rest == "attn.cpb_mlp.2.weight":
                _put_in(params, (blk, "attn", "cpb_fc2", "kernel"), w.T)
            elif m2 := re.match(r"attn\.proj\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", "proj",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        w.T if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped swinv2 block param %s", name)
        elif m := re.match(r"norm\.(weight|bias)", name):
            _put_in(params, ("norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"head\.(?:fc\.)?(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped swinv2 param %s (shape %s)", name, w.shape)
    return params


def convert_xcit_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm Xcit state_dict -> {'params', 'batch_stats'} (models/xcit.py).

    Reference models/xcit.py naming: ConvPatchEmbed as nested Sequentials
    (patch_embed.proj.{0,2,4,6}.{0=conv,1=bn}, :68-106), Fourier pos
    encoding's learned 1x1 conv (pos_embed.token_projection, :43), XCA
    blocks.N (attn.temperature/qkv/proj, norm1/3/2, local_mp.conv1/bn/conv2
    depthwise pair, bare gamma1/gamma3/gamma2, :199-297), class-attention
    cls_attn_blocks.N (attn.q/k/v/proj, gamma1/gamma2, :144-194), norm,
    head. BatchNorm running stats land in 'batch_stats'."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(dst, kind, w):
        if kind == "weight":
            _put_in(params, (*dst, "scale"), w)
        elif kind == "bias":
            _put_in(params, (*dst, "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (*dst, "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (*dst, "var"), w)

    norm_kinds = r"(weight|bias|running_mean|running_var)"
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if name == "cls_token":
            _put_in(params, ("cls_token",), w)
        elif m := re.match(r"patch_embed\.proj\.(\d)\.0\.weight", name):
            _put_in(params,
                    (f"patch_embed_conv{int(m.group(1)) // 2}", "kernel"),
                    _conv_hwio(w))
        elif m := re.match(rf"patch_embed\.proj\.(\d)\.1\.{norm_kinds}", name):
            put_norm((f"patch_embed_bn{int(m.group(1)) // 2}",),
                     m.group(2), w)
        elif m := re.match(r"pos_embed\.token_projection\.(weight|bias)", name):
            _put_in(params, ("pos_proj",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w[:, :, 0, 0].T if m.group(1) == "weight" else w)
        elif m := re.match(r"blocks\.(\d+)\.(.+)", name):
            blk, rest = f"blocks_{m.group(1)}", m.group(2)
            if m2 := re.match(r"gamma(\d)", rest):
                _put_in(params, (blk, f"gamma{m2.group(1)}"), w)
            elif m2 := re.match(r"(norm1|norm2|norm3)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif rest == "attn.temperature":
                _put_in(params, (blk, "attn", "temperature"), w)
            elif m2 := re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"local_mp\.(conv1|conv2)\.(weight|bias)", rest):
                _put_in(params, (blk, "local_mp", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        _conv_hwio(w) if m2.group(2) == "weight" else w)
            elif m2 := re.match(rf"local_mp\.bn\.{norm_kinds}", rest):
                put_norm((blk, "local_mp", "bn"), m2.group(1), w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped xcit block param %s", name)
        elif m := re.match(r"cls_attn_blocks\.(\d+)\.(.+)", name):
            blk, rest = f"cls_attn_blocks_{m.group(1)}", m.group(2)
            if m2 := re.match(r"gamma(\d)", rest):
                _put_in(params, (blk, f"gamma{m2.group(1)}"), w)
            elif m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight" else "bias"), w)
            elif m2 := re.match(r"attn\.(q|k|v|proj)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, "mlp", f"fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            else:
                log.warning("unmapped xcit cls-attn param %s", name)
        elif m := re.match(r"norm\.(weight|bias)", name):
            _put_in(params, ("norm",
                             "scale" if m.group(1) == "weight" else "bias"), w)
        elif m := re.match(r"head\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped xcit param %s (shape %s)", name, w.shape)
    return {"params": params, "batch_stats": stats}


def convert_pvt2_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm PyramidVisionTransformerV2 state_dict -> our flax params
    (models/pvt_v2.py).

    Reference models/pvt_v2.py naming: patch_embed.proj/norm for the stem
    OverlapPatchEmbed (:194-205), stages.N.downsample.proj/norm for stages
    1+ (:235-243), blocks with separate q + fused kv Linears, spatial-
    reduction conv attn.sr + attn.norm (:91-110), MlpWithDepthwiseConv
    fc1/dwconv/fc2 (:35-66), per-stage trailing norm (:258), mean-pool
    head. Our flax flattens the MLP into block-level fc1/dwconv/fc2 and
    names the SR norm sr_norm."""
    params: Dict[str, Any] = {}

    def put_ln(dst, kind, w):
        _put_in(params, (*dst, "scale" if kind == "weight" else "bias"), w)

    for name, w in sd.items():
        w = _t(w)
        if m := re.match(r"patch_embed\.proj\.(weight|bias)", name):
            _put_in(params, ("patch_embed_0",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(1) == "weight" else w)
        elif m := re.match(r"patch_embed\.norm\.(weight|bias)", name):
            put_ln(("embed_norm_0",), m.group(1), w)
        elif m := re.match(r"stages\.(\d+)\.downsample\.proj\.(weight|bias)", name):
            _put_in(params, (f"patch_embed_{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif m := re.match(r"stages\.(\d+)\.downsample\.norm\.(weight|bias)", name):
            put_ln((f"embed_norm_{m.group(1)}",), m.group(2), w)
        elif m := re.match(r"stages\.(\d+)\.norm\.(weight|bias)", name):
            put_ln((f"stage_norm_{m.group(1)}",), m.group(2), w)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", name):
            blk = f"stages_{m.group(1)}_blocks_{m.group(2)}"
            rest = m.group(3)
            if m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                put_ln((blk, m2.group(1)), m2.group(2), w)
            elif m2 := re.match(r"attn\.(q|kv|proj)\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"attn\.sr\.(weight|bias)", rest):
                _put_in(params, (blk, "attn", "sr",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        _conv_hwio(w) if m2.group(1) == "weight" else w)
            elif m2 := re.match(r"attn\.norm\.(weight|bias)", rest):
                put_ln((blk, "attn", "sr_norm"), m2.group(1), w)
            elif m2 := re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        w.T if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"mlp\.dwconv\.(weight|bias)", rest):
                _put_in(params, (blk, "dwconv",
                                 "kernel" if m2.group(1) == "weight" else "bias"),
                        _conv_hwio(w) if m2.group(1) == "weight" else w)
            else:
                log.warning("unmapped pvt_v2 block param %s", name)
        elif m := re.match(r"head\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped pvt_v2 param %s (shape %s)", name, w.shape)
    return params


def convert_regnet_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm RegNet state_dict -> {'params', 'batch_stats'} (models/regnet.py).

    Reference models/regnet.py naming: stem (ConvNormAct stem.conv/stem.bn,
    or a bare conv `stem.weight` for preact :574-576), stages s1-s4 with
    blocks b1-bN (:502, :591). Bottleneck blocks (:261-360) are ConvNormAct
    triples convN.conv/convN.bn + se.fc1/fc2 + downsample.conv/bn (or
    downsample.1.* behind an avg-pool). PreBottleneck blocks (:362-433) are
    bare convs with normN BatchNormAct params named directly and a bare
    downsample conv (`downsample.weight` / avg `downsample.1.weight`).
    regnetz final_conv.conv/bn (:606), head.fc (:613). Our flax tree uses
    the same normN site numbering in both layouts (see models/regnet.py),
    so the mapping is positional: convN.bn -> normN.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(dst, kind, w):
        if kind == "weight":
            _put_in(params, (*dst, "scale"), w)
        elif kind == "bias":
            _put_in(params, (*dst, "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (*dst, "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (*dst, "var"), w)

    norm_kinds = r"(weight|bias|running_mean|running_var)"
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if name in ("stem.conv.weight", "stem.weight"):
            _put_in(params, ("stem_conv", "kernel"), _conv_hwio(w))
        elif m := re.match(rf"stem\.bn\.{norm_kinds}", name):
            put_norm(("stem_bn",), m.group(1), w)
        elif name == "final_conv.conv.weight":
            _put_in(params, ("final_conv", "kernel"), _conv_hwio(w))
        elif m := re.match(rf"final_conv\.bn\.{norm_kinds}", name):
            put_norm(("final_conv_bn",), m.group(1), w)
        elif m := re.match(r"head\.fc\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        elif m := re.match(r"s(\d+)\.b(\d+)\.(.+)", name):
            blk = f"stages_{int(m.group(1)) - 1}_blocks_{int(m.group(2)) - 1}"
            rest = m.group(3)
            if m2 := re.match(r"conv(\d)\.conv\.weight", rest):
                _put_in(params, (blk, f"conv{m2.group(1)}", "kernel"),
                        _conv_hwio(w))
            elif m2 := re.match(rf"conv(\d)\.bn\.{norm_kinds}", rest):
                put_norm((blk, f"norm{m2.group(1)}"), m2.group(2), w)
            elif m2 := re.match(r"conv(\d)\.weight", rest):  # preact bare
                _put_in(params, (blk, f"conv{m2.group(1)}", "kernel"),
                        _conv_hwio(w))
            elif m2 := re.match(rf"norm(\d)\.{norm_kinds}", rest):
                put_norm((blk, f"norm{m2.group(1)}"), m2.group(2), w)
            elif m2 := re.match(r"se\.fc(1|2)\.(weight|bias)", rest):
                dst = "se_reduce" if m2.group(1) == "1" else "se_expand"
                _put_in(params, (blk, dst,
                                 "kernel" if m2.group(2) == "weight" else "bias"),
                        _conv_hwio(w) if m2.group(2) == "weight" else w)
            elif rest in ("downsample.conv.weight", "downsample.1.conv.weight",
                          "downsample.weight", "downsample.1.weight"):
                _put_in(params, (blk, "down_conv", "kernel"), _conv_hwio(w))
            elif m2 := re.match(rf"downsample\.(?:1\.)?bn\.{norm_kinds}", rest):
                put_norm((blk, "down_norm"), m2.group(1), w)
            else:
                log.warning("unmapped regnet block param %s", name)
        else:
            log.warning("unmapped regnet param %s (shape %s)", name, w.shape)
    return {"params": params, "batch_stats": stats}


def convert_vgg_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm VGG state_dict -> {'params', 'batch_stats'} (models/vgg.py).

    timm naming (reference vgg.py:100-167): `features.{i}` is a flat
    nn.Sequential index over conv/BN/ReLU/maxpool, so convs are renumbered
    here to consecutive flax indices (features_{li}) with each BN (the _bn
    variants) attached to the conv right before it; `pre_logits` is the
    ConvMlp 7x7/1x1 head (reference vgg.py:32-66) and `head.fc` the
    classifier.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    feat: Dict[int, Dict[str, np.ndarray]] = {}
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if m := re.match(r"features\.(\d+)\.(.+)", name):
            feat.setdefault(int(m.group(1)), {})[m.group(2)] = w
        elif m := re.match(r"pre_logits\.fc(1|2)\.(weight|bias)", name):
            _put_in(params, (f"pre_logits_fc{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif m := re.match(r"head\.fc\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped vgg param %s (shape %s)", name, w.shape)
    li = -1
    for idx in sorted(feat):
        entry = feat[idx]
        if "running_mean" in entry:  # the BN right after conv li
            _put_in(params, (f"features_{li}_bn", "scale"), entry["weight"])
            _put_in(params, (f"features_{li}_bn", "bias"), entry["bias"])
            _put_in(stats, (f"features_{li}_bn", "mean"),
                    entry["running_mean"])
            _put_in(stats, (f"features_{li}_bn", "var"), entry["running_var"])
        else:
            li += 1
            _put_in(params, (f"features_{li}", "kernel"),
                    _conv_hwio(entry["weight"]))
            if "bias" in entry:
                _put_in(params, (f"features_{li}", "bias"), entry["bias"])
    return {"params": params, "batch_stats": stats}


def convert_densenet_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm DenseNet state_dict -> {'params', 'batch_stats'}
    (models/densenet.py).

    timm naming (reference densenet.py:276-325): features.conv0/norm0 stem
    (deep stems add conv1/norm1/conv2/norm2),
    features.denseblock{B}.denselayer{L}.{norm1,conv1,norm2,conv2} (1-based),
    features.transition{B}.{norm,conv}, features.norm5 final norm,
    classifier head. The norm layers are BatchNormAct2d — state-dict keys
    identical to BatchNorm2d.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    deep_stem = "features.conv1.weight" in sd

    def put_norm(dst, kind, w):
        if kind == "weight":
            _put_in(params, (dst, "scale"), w)
        elif kind == "bias":
            _put_in(params, (dst, "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (dst, "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (dst, "var"), w)

    norm_kinds = r"(weight|bias|running_mean|running_var)"
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if m := re.match(r"features\.conv(\d)\.weight", name):
            dst = f"stem_conv{m.group(1)}" if deep_stem else "stem_conv"
            _put_in(params, (dst, "kernel"), _conv_hwio(w))
        elif m := re.match(rf"features\.norm([0-4])\.{norm_kinds}", name):
            dst = f"stem_bn{m.group(1)}" if deep_stem else "stem_bn"
            put_norm(dst, m.group(2), w)
        elif m := re.match(
                r"features\.denseblock(\d+)\.denselayer(\d+)\.(.+)", name):
            blk = f"db{int(m.group(1)) - 1}_l{int(m.group(2)) - 1}"
            rest = m.group(3)
            if m2 := re.match(r"conv(\d)\.weight", rest):
                _put_in(params, (f"{blk}_conv{m2.group(1)}", "kernel"),
                        _conv_hwio(w))
            elif m2 := re.match(rf"norm(\d)\.{norm_kinds}", rest):
                put_norm(f"{blk}_bn{m2.group(1)}", m2.group(2), w)
            else:
                log.warning("unmapped densenet layer param %s", name)
        elif m := re.match(r"features\.transition(\d+)\.(.+)", name):
            tr = f"tr{int(m.group(1)) - 1}"
            rest = m.group(2)
            if rest == "conv.weight":
                _put_in(params, (f"{tr}_conv", "kernel"), _conv_hwio(w))
            elif m2 := re.match(rf"norm\.{norm_kinds}", rest):
                put_norm(f"{tr}_bn", m2.group(1), w)
            else:
                log.warning("unmapped densenet transition param %s", name)
        elif m := re.match(rf"features\.norm5\.{norm_kinds}", name):
            put_norm("final_bn", m.group(1), w)
        elif m := re.match(r"classifier\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped densenet param %s (shape %s)", name, w.shape)
    return {"params": params, "batch_stats": stats}


# GhostNet stage lengths are fixed across all width multipliers (reference
# ghostnet.py:852-872 cfgs): flax blocks are named b{stage}_{GLOBAL index}
# while timm nests nn.Sequential stages with per-stage indices.
_GHOST_STAGE_OFFSET = (0, 1, 2, 3, 4, 5, 6, 11, 12)


def convert_ghostnet_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm GhostNet v1/v2 state_dict -> {'params', 'batch_stats'}
    (models/ghostnet.py).

    timm naming (reference ghostnet.py:44-112 GhostModule/V2, :330-407
    GhostBottleneck, :586-655 trunk): conv_stem/bn1, blocks.{S}.{B} with
    ghost1/ghost2 (primary_conv.0/.1 + cheap_operation.0/.1, v2 adds
    short_conv.0-.5), conv_dw/bn_dw on strided blocks, se.conv_reduce/
    conv_expand, shortcut.0-.3; the last stage is one ConvBnAct
    (conv/bn1) -> our final_conv; conv_head is a post-pool 1x1 conv ->
    our Dense; classifier.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_norm(dst, kind, w):
        if kind == "weight":
            _put_in(params, (*dst, "scale"), w)
        elif kind == "bias":
            _put_in(params, (*dst, "bias"), w)
        elif kind == "running_mean":
            _put_in(stats, (*dst, "mean"), w)
        elif kind == "running_var":
            _put_in(stats, (*dst, "var"), w)

    # v2 short_conv Sequential index -> our _ConvBn child of the ghost module
    short_map = {"0": ("short1", "conv"), "1": ("short1", "bn"),
                 "2": ("short2", "conv"), "3": ("short2", "bn"),
                 "4": ("short3", "conv"), "5": ("short3", "bn")}
    norm_kinds = r"(weight|bias|running_mean|running_var)"
    for name, w in sd.items():
        if name.endswith("num_batches_tracked"):
            continue
        w = _t(w)
        if name == "conv_stem.weight":
            _put_in(params, ("stem", "conv", "kernel"), _conv_hwio(w))
        elif m := re.match(rf"bn1\.{norm_kinds}", name):
            put_norm(("stem", "bn"), m.group(1), w)
        elif m := re.match(r"blocks\.(\d+)\.(\d+)\.conv\.weight", name):
            _put_in(params, ("final_conv", "conv", "kernel"), _conv_hwio(w))
        elif m := re.match(rf"blocks\.(\d+)\.(\d+)\.bn1\.{norm_kinds}", name):
            put_norm(("final_conv", "bn"), m.group(3), w)
        elif m := re.match(r"blocks\.(\d+)\.(\d+)\.(.+)", name):
            si, bi, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            blk = f"b{si}_{_GHOST_STAGE_OFFSET[si] + bi}"
            if m2 := re.match(
                    r"(ghost1|ghost2)\.primary_conv\.(0|1)\.(.+)", rest):
                g, which, kind = m2.group(1), m2.group(2), m2.group(3)
                if which == "0":
                    _put_in(params, (blk, g, "primary", "conv", "kernel"),
                            _conv_hwio(w))
                else:
                    put_norm((blk, g, "primary", "bn"), kind, w)
            elif m2 := re.match(
                    r"(ghost1|ghost2)\.cheap_operation\.(0|1)\.(.+)", rest):
                g, which, kind = m2.group(1), m2.group(2), m2.group(3)
                if which == "0":
                    _put_in(params, (blk, g, "cheap", "conv", "kernel"),
                            _conv_hwio(w))
                else:
                    put_norm((blk, g, "cheap", "bn"), kind, w)
            elif m2 := re.match(
                    r"(ghost1|ghost2)\.short_conv\.([0-5])\.(.+)", rest):
                g, which, kind = m2.group(1), m2.group(2), m2.group(3)
                sub, leaf = short_map[which]
                if leaf == "conv":
                    _put_in(params, (blk, g, sub, "conv", "kernel"),
                            _conv_hwio(w))
                else:
                    put_norm((blk, g, sub, "bn"), kind, w)
            elif rest == "conv_dw.weight":
                _put_in(params, (blk, "dw", "conv", "kernel"), _conv_hwio(w))
            elif m2 := re.match(rf"bn_dw\.{norm_kinds}", rest):
                put_norm((blk, "dw", "bn"), m2.group(1), w)
            elif m2 := re.match(r"se\.conv_(reduce|expand)\.(weight|bias)",
                                rest):
                _put_in(params, (blk, f"se_{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight"
                                 else "bias"),
                        _conv_hwio(w) if m2.group(2) == "weight" else w)
            elif m2 := re.match(r"shortcut\.([0-3])\.(.+)", rest):
                which, kind = m2.group(1), m2.group(2)
                sub = "shortcut_dw" if which in ("0", "1") else "shortcut_pw"
                if which in ("0", "2"):
                    _put_in(params, (blk, sub, "conv", "kernel"),
                            _conv_hwio(w))
                else:
                    put_norm((blk, sub, "bn"), kind, w)
            else:
                log.warning("unmapped ghostnet block param %s", name)
        elif m := re.match(r"conv_head\.(weight|bias)", name):
            if m.group(1) == "weight":  # post-pool 1x1 conv == Dense
                _put_in(params, ("conv_head", "kernel"), w[:, :, 0, 0].T)
            else:
                _put_in(params, ("conv_head", "bias"), w)
        elif m := re.match(r"classifier\.(weight|bias)", name):
            _put_in(params, ("classifier",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        else:
            log.warning("unmapped ghostnet param %s (shape %s)", name, w.shape)
    return {"params": params, "batch_stats": stats}


def convert_metaformer_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """timm MetaFormer (poolformer v1/v2, convformer, caformer) state_dict
    -> our flax params (models/metaformer.py).

    Reference models/metaformer.py naming: stem.conv(+norm), per-stage
    stages.{i}.downsample.{norm,conv} (norm BEFORE conv, :78-105),
    blocks stages.{i}.blocks.{j} with norm1/token_mixer/layer_scale1/
    res_scale1/norm2/mlp/layer_scale2/res_scale2 (:321-376). Token mixers:
    Pooling (no params), SepConv pwconv1/act1/dwconv/pwconv2 (:240-271),
    Attention qkv/proj (:159-215). MLPs are 1x1 convs in conv stages
    (use_nchw) and Linears in attention stages — both collapse to Dense
    kernels here. Head: head.norm + head.fc (plain Linear or MlpHead
    fc1/norm/fc2, :290-318). StarReLU scalars (1,) -> ().
    """
    params: Dict[str, Any] = {}

    def lin(w):  # Linear (out,in) or 1x1 conv (out,in,1,1) -> (in,out)
        return (w[:, :, 0, 0] if w.ndim == 4 else w).T

    for name, w in sd.items():
        w = _t(w)
        if name == "stem.conv.weight":
            _put_in(params, ("downsample_0", "kernel"), _conv_hwio(w))
        elif name == "stem.conv.bias":
            _put_in(params, ("downsample_0", "bias"), w)
        elif name == "stem.norm.weight":
            _put_in(params, ("downsample_0_norm", "scale"), w)
        elif m := re.match(r"stages\.(\d+)\.downsample\.norm\.weight", name):
            _put_in(params, (f"downsample_{m.group(1)}_norm", "scale"), w)
        elif m := re.match(r"stages\.(\d+)\.downsample\.conv\.(weight|bias)",
                           name):
            _put_in(params, (f"downsample_{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    _conv_hwio(w) if m.group(2) == "weight" else w)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", name):
            blk = f"stages_{m.group(1)}_blocks_{m.group(2)}"
            rest = m.group(3)
            if m2 := re.match(r"(norm1|norm2)\.(weight|bias)", rest):
                _put_in(params, (blk, m2.group(1),
                                 "scale" if m2.group(2) == "weight"
                                 else "bias"), w)
            elif m2 := re.match(r"(layer|res)_scale(\d)\.scale", rest):
                tag = "ls" if m2.group(1) == "layer" else "rs"
                _put_in(params, (blk, f"{tag}{m2.group(2)}"), w.reshape(-1))
            elif m2 := re.match(r"token_mixer\.pwconv(\d)\.weight", rest):
                _put_in(params, (blk, f"mix_pw{m2.group(1)}", "kernel"),
                        lin(w))
            elif rest == "token_mixer.dwconv.weight":
                _put_in(params, (blk, "mix_dw", "kernel"), _conv_hwio(w))
            elif m2 := re.match(r"token_mixer\.act1\.(scale|bias)", rest):
                _put_in(params, (blk, "mix_act", m2.group(1)),
                        w.reshape(()))
            elif rest == "token_mixer.qkv.weight":
                _put_in(params, (blk, "mix_qkv", "kernel"), w.T)
            elif rest == "token_mixer.proj.weight":
                _put_in(params, (blk, "mix_proj", "kernel"), w.T)
            elif m2 := re.match(r"mlp\.fc(\d)\.(weight|bias)", rest):
                _put_in(params, (blk, f"mlp_fc{m2.group(1)}",
                                 "kernel" if m2.group(2) == "weight"
                                 else "bias"),
                        lin(w) if m2.group(2) == "weight"
                        else w.reshape(-1))
            elif m2 := re.match(r"mlp\.act\.(scale|bias)", rest):
                _put_in(params, (blk, "mlp_act", m2.group(1)),
                        w.reshape(()))
            else:
                log.warning("unmapped metaformer block param %s", name)
        elif m := re.match(r"head\.norm\.(weight|bias)", name):
            _put_in(params, ("norm",
                             "scale" if m.group(1) == "weight" else "bias"),
                    w)
        elif m := re.match(r"head\.fc\.(weight|bias)", name):
            _put_in(params, ("head",
                             "kernel" if m.group(1) == "weight" else "bias"),
                    w.T if m.group(1) == "weight" else w)
        elif m := re.match(r"head\.fc\.fc(\d)\.(weight|bias)", name):
            _put_in(params, (f"head_fc{m.group(1)}",
                             "kernel" if m.group(2) == "weight" else "bias"),
                    w.T if m.group(2) == "weight" else w)
        elif m := re.match(r"head\.fc\.norm\.(weight|bias)", name):
            _put_in(params, ("head_norm",
                             "scale" if m.group(1) == "weight" else "bias"),
                    w)
        else:
            log.warning("unmapped metaformer param %s (shape %s)",
                        name, w.shape)
    return params


def detect_architecture(sd: Dict[str, Any]) -> str:
    keys = list(sd)
    if any(k.startswith("cls_attn_blocks.") for k in keys):
        return "xcit"
    if any(re.search(r"\.attn\.kv\.weight", k) for k in keys):
        return "pvt2"
    if any(k.startswith("blocks_token_only.") for k in keys):
        return "cait"
    if any(".attn_block." in k or ".attn_grid." in k
           or re.search(r"stages\.\d+\.blocks\.\d+\.conv\.", k)
           for k in keys):
        return "maxxvit"  # before swin: maxvit also has rel-pos tables
    if any("cpb_mlp" in k for k in keys):
        return "swinv2"  # before beit: both carry attn.q_bias
    if any(k.endswith("attn.q_bias") for k in keys) \
            and any("relative_position_bias_table" in k for k in keys):
        return "beit"  # before swin: both carry relative_position_bias_table
    if any(".attn.q_proj." in k or ".mlp.fc1_g." in k
           or k.endswith("attn.q_bias")
           or re.match(r"blocks\.\d+\.gamma_1$", k) for k in keys):
        return "eva"  # q_bias WITHOUT rel-pos tables / split q,k,v / SwiGLU
    if any("relative_position_bias_table" in k for k in keys):
        return "swin"
    if any(re.match(r"s\d+\.b\d+\.", k) for k in keys):
        return "regnet"
    if any(re.match(r"layer\d+\.\d+\.conv\d\.weight", k) for k in keys):
        return "resnet"
    if any("token_mixer." in k or ".res_scale1." in k
           or ".layer_scale1." in k or ".mlp.act.scale" in k for k in keys) \
            and "stem.conv.weight" in keys:
        # before resnetv2: metaformer also has stages.N.blocks.M.norm1 +
        # stem.conv; pool mixers are param-free so v1 is keyed off
        # layer_scale1, v2 off res_scale1/StarReLU scalars
        return "metaformer"
    if any(re.match(r"stages\.\d+\.blocks\.\d+\.norm1\.", k) for k in keys) \
            and ("stem.conv.weight" in keys or "stem.conv1.weight" in keys):
        return "resnetv2"  # pre-act: norm1 BEFORE conv1 inside the block
    if any(".ghost1." in k for k in keys):
        # before efficientnet (ghostnet also has conv_stem) and before
        # convnext (ghost bottlenecks also carry .conv_dw.)
        return "ghostnet"
    if any(k.startswith("features.denseblock") for k in keys):
        return "densenet"
    if any(k.startswith("pre_logits.fc1.") for k in keys):
        return "vgg"
    if "conv_stem.weight" in keys:
        # mobilenetv3/lcnet: post-pool conv_head carries a bias and there is
        # no top-level bn2 after it (efficientnet has bias-free conv_head+bn2)
        if "conv_head.bias" in keys and \
                not any(k.startswith("bn2.") for k in keys):
            return "mobilenetv3"
        return "efficientnet"
    if any(".conv_dw." in k or k.startswith("stem.0") for k in keys):
        return "convnext"
    if any(".mlp_tokens." in k or ".linear_tokens." in k
           or ".gate.proj." in k for k in keys):
        return "mixer"
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
    arch = detect_architecture(sd)
    if arch == "xcit":
        return convert_xcit_state_dict(sd)
    if arch == "pvt2":
        return convert_pvt2_state_dict(sd)
    if arch == "cait":
        return convert_cait_state_dict(sd)
    if arch == "swinv2":
        return convert_swinv2_state_dict(sd)
    if arch == "eva":
        return convert_eva_state_dict(sd)
    if arch == "beit":
        return convert_beit_state_dict(sd)
    if arch == "swin":
        return convert_swin_state_dict(sd)
    if arch == "regnet":
        return convert_regnet_state_dict(sd)
    if arch == "resnet":
        # {'params', 'batch_stats'}: callers merge stats into model_state
        return convert_resnet_state_dict(sd)
    if arch == "resnetv2":
        return convert_resnetv2_state_dict(sd)
    if arch == "maxxvit":
        return convert_maxxvit_state_dict(sd)
    if arch == "efficientnet":
        return convert_efficientnet_state_dict(sd)
    if arch == "mobilenetv3":
        return convert_mobilenetv3_state_dict(sd)
    if arch == "ghostnet":
        return convert_ghostnet_state_dict(sd)
    if arch == "densenet":
        return convert_densenet_state_dict(sd)
    if arch == "vgg":
        return convert_vgg_state_dict(sd)
    if arch == "convnext":
        return convert_convnext_state_dict(sd)
    if arch == "metaformer":
        return convert_metaformer_state_dict(sd)
    if arch == "mixer":
        return convert_mixer_state_dict(sd)
    return convert_vit_state_dict(sd)
