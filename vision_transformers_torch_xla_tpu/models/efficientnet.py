"""EfficientNet superfamily in Flax, NHWC — full registry surface.

Parity with the reference's efficientnet.py (2935 LoC; arch defs at
:464-1307, registrations :1897-2740): MNASNet A1/B1/small, MobileNetV1/V2,
FBNet-C, Single-Path NAS, EfficientNet B0-B8/L2 (+GroupNorm/EvoNorm/blur
variants), EfficientNet-EdgeTPU (es/em/el), CondConv (cc), Lite 0-4,
EfficientNetV2 (rw_t/rw_s/rw_m, S/M/L/XL, base B0-B3), EfficientNet-X/H,
MixNet S/M/L/XL/XXL, TinyNet a-e, MobileNet-EdgeTPU v1/v2, and the tiny
`test_efficientnet*` configs.  All decoded through the TPU-native
arch-string builder in effnet_builder.py (one jit-traced straight-line
graph per model; convs NHWC bf16 on the MXU).

`tf_*` names are same-architecture aliases of the torch-padding variants
(the reference's differ only in weight provenance + SAME padding; padding
here is SAME everywhere, which matches the TF semantics).  `*_pruned`
names build the unpruned arch — channel-pruning recipes apply at
pretrained-load time via models/prune.py, mirroring how the reference
adapts at build time from models/_pruned/*.txt.
"""
from __future__ import annotations

import sys

from vision_transformers_torch_xla_tpu.models.effnet_builder import (
    EffNet,
    decode_arch_def,
    round_channels,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []

# ---------------------------------------------------------------------------
# arch definitions (reference efficientnet.py generator bodies)
# ---------------------------------------------------------------------------

_MNASNET_A1 = (
    ("ds_r1_k3_s1_e1_c16_noskip",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r3_k5_s2_e3_c40_se0.25",),
    ("ir_r4_k3_s2_e6_c80",),
    ("ir_r2_k3_s1_e6_c112_se0.25",),
    ("ir_r3_k5_s2_e6_c160_se0.25",),
    ("ir_r1_k3_s1_e6_c320",),
)
_MNASNET_B1 = (
    ("ds_r1_k3_s1_c16_noskip",),
    ("ir_r3_k3_s2_e3_c24",),
    ("ir_r3_k5_s2_e3_c40",),
    ("ir_r3_k5_s2_e6_c80",),
    ("ir_r2_k3_s1_e6_c96",),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320_noskip",),
)
_MNASNET_SMALL = (
    ("ds_r1_k3_s1_c8",),
    ("ir_r1_k3_s2_e3_c16",),
    ("ir_r2_k3_s2_e6_c16",),
    ("ir_r4_k5_s2_e6_c32_se0.25",),
    ("ir_r3_k3_s1_e6_c32_se0.25",),
    ("ir_r3_k5_s2_e6_c88_se0.25",),
    ("ir_r1_k3_s1_e6_c144",),
)
_MOBILENET_V1 = (
    ("dsa_r1_k3_s1_c64",),
    ("dsa_r2_k3_s2_c128",),
    ("dsa_r2_k3_s2_c256",),
    ("dsa_r6_k3_s2_c512",),
    ("dsa_r2_k3_s2_c1024",),
)
_MOBILENET_V2 = (
    ("ds_r1_k3_s1_c16",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r3_k3_s2_e6_c32",),
    ("ir_r4_k3_s2_e6_c64",),
    ("ir_r3_k3_s1_e6_c96",),
    ("ir_r3_k3_s2_e6_c160",),
    ("ir_r1_k3_s1_e6_c320",),
)
_FBNETC = (
    ("ir_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_s2_e6_c24", "ir_r2_k3_s1_e1_c24"),
    ("ir_r1_k5_s2_e6_c32", "ir_r1_k5_s1_e3_c32", "ir_r1_k5_s1_e6_c32",
     "ir_r1_k3_s1_e6_c32"),
    ("ir_r1_k5_s2_e6_c64", "ir_r1_k5_s1_e3_c64", "ir_r2_k5_s1_e6_c64"),
    ("ir_r3_k5_s1_e6_c112", "ir_r1_k5_s1_e3_c112"),
    ("ir_r4_k5_s2_e6_c184",),
    ("ir_r1_k3_s1_e6_c352",),
)
_SPNASNET = (
    ("ds_r1_k3_s1_c16_noskip",),
    ("ir_r3_k3_s2_e3_c24",),
    ("ir_r1_k5_s2_e6_c40", "ir_r3_k3_s1_e3_c40"),
    ("ir_r1_k5_s2_e6_c80", "ir_r3_k3_s1_e3_c80"),
    ("ir_r1_k5_s1_e6_c96", "ir_r3_k5_s1_e3_c96"),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320_noskip",),
)
_EFFICIENTNET = (
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25",),
    ("ir_r4_k5_s2_e6_c192_se0.25",),
    ("ir_r1_k3_s1_e6_c320_se0.25",),
)
_EFFICIENTNET_EDGE = (
    ("er_r1_k3_s1_e4_c24_fc24_noskip",),
    ("er_r2_k3_s2_e8_c32",),
    ("er_r4_k3_s2_e8_c48",),
    ("ir_r5_k5_s2_e8_c96",),
    ("ir_r4_k5_s1_e8_c144",),
    ("ir_r2_k5_s2_e8_c192",),
)
_EFFICIENTNET_CC = (
    ("ds_r1_k3_s1_e1_c16_se0.25",),
    ("ir_r2_k3_s2_e6_c24_se0.25",),
    ("ir_r2_k5_s2_e6_c40_se0.25",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25_cc4",),
    ("ir_r4_k5_s2_e6_c192_se0.25_cc4",),
    ("ir_r1_k3_s1_e6_c320_se0.25_cc4",),
)
_EFFICIENTNET_LITE = (
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r2_k3_s2_e6_c24",),
    ("ir_r2_k5_s2_e6_c40",),
    ("ir_r3_k3_s2_e6_c80",),
    ("ir_r3_k5_s1_e6_c112",),
    ("ir_r4_k5_s2_e6_c192",),
    ("ir_r1_k3_s1_e6_c320",),
)
_V2_BASE = (
    ("cn_r1_k3_s1_e1_c16_skip",),
    ("er_r2_k3_s2_e4_c32",),
    ("er_r2_k3_s2_e4_c48",),
    ("ir_r3_k3_s2_e4_c96_se0.25",),
    ("ir_r5_k3_s1_e6_c112_se0.25",),
    ("ir_r8_k3_s2_e6_c192_se0.25",),
)
_V2_S = (
    ("cn_r2_k3_s1_e1_c24_skip",),
    ("er_r4_k3_s2_e4_c48",),
    ("er_r4_k3_s2_e4_c64",),
    ("ir_r6_k3_s2_e4_c128_se0.25",),
    ("ir_r9_k3_s1_e6_c160_se0.25",),
    ("ir_r15_k3_s2_e6_c256_se0.25",),
)
_V2_S_RW = (
    ("er_r2_k3_s1_e1_c24",),
    ("er_r4_k3_s2_e4_c48",),
    ("er_r4_k3_s2_e4_c64",),
    ("ir_r6_k3_s2_e4_c128_se0.25",),
    ("ir_r9_k3_s1_e6_c160_se0.25",),
    ("ir_r15_k3_s2_e6_c272_se0.25",),
)
_V2_M = (
    ("cn_r3_k3_s1_e1_c24_skip",),
    ("er_r5_k3_s2_e4_c48",),
    ("er_r5_k3_s2_e4_c80",),
    ("ir_r7_k3_s2_e4_c160_se0.25",),
    ("ir_r14_k3_s1_e6_c176_se0.25",),
    ("ir_r18_k3_s2_e6_c304_se0.25",),
    ("ir_r5_k3_s1_e6_c512_se0.25",),
)
_V2_L = (
    ("cn_r4_k3_s1_e1_c32_skip",),
    ("er_r7_k3_s2_e4_c64",),
    ("er_r7_k3_s2_e4_c96",),
    ("ir_r10_k3_s2_e4_c192_se0.25",),
    ("ir_r19_k3_s1_e6_c224_se0.25",),
    ("ir_r25_k3_s2_e6_c384_se0.25",),
    ("ir_r7_k3_s1_e6_c640_se0.25",),
)
_V2_XL = (
    ("cn_r4_k3_s1_e1_c32_skip",),
    ("er_r8_k3_s2_e4_c64",),
    ("er_r8_k3_s2_e4_c96",),
    ("ir_r16_k3_s2_e4_c192_se0.25",),
    ("ir_r24_k3_s1_e6_c256_se0.25",),
    ("ir_r32_k3_s2_e6_c512_se0.25",),
    ("ir_r8_k3_s1_e6_c640_se0.25",),
)
_X_V1 = (
    ("ds_r1_k3_s1_e1_c16_se0.25_d1",),
    ("er_r2_k3_s2_e6_c24_se0.25_nre",),
    ("er_r2_k5_s2_e6_c40_se0.25_nre",),
    ("ir_r3_k3_s2_e6_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25",),
    ("ir_r4_k5_s2_e6_c192_se0.25",),
    ("ir_r1_k3_s1_e6_c320_se0.25",),
)
_X_V2 = (
    ("ds_r1_k3_s1_e1_c16_se0.25_d1",),
    ("er_r2_k3_s2_e4_c24_se0.25_nre",),
    ("er_r2_k5_s2_e4_c40_se0.25_nre",),
    ("ir_r3_k3_s2_e4_c80_se0.25",),
    ("ir_r3_k5_s1_e6_c112_se0.25",),
    ("ir_r4_k5_s2_e6_c192_se0.25",),
    ("ir_r1_k3_s1_e6_c320_se0.25",),
)
_MIXNET_S = (
    ("ds_r1_k3_s1_e1_c16",),
    ("ir_r1_k3_a1.1_p1.1_s2_e6_c24", "ir_r1_k3_a1.1_p1.1_s1_e3_c24"),
    ("ir_r1_k3.5.7_s2_e6_c40_se0.5_nsw",
     "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
    ("ir_r1_k3.5.7_p1.1_s2_e6_c80_se0.25_nsw",
     "ir_r2_k3.5_p1.1_s1_e6_c80_se0.25_nsw"),
    ("ir_r1_k3.5.7_a1.1_p1.1_s1_e6_c120_se0.5_nsw",
     "ir_r2_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
    ("ir_r1_k3.5.7.9.11_s2_e6_c200_se0.5_nsw",
     "ir_r2_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
)
_MIXNET_M = (
    ("ds_r1_k3_s1_e1_c24",),
    ("ir_r1_k3.5.7_a1.1_p1.1_s2_e6_c32", "ir_r1_k3_a1.1_p1.1_s1_e3_c32"),
    ("ir_r1_k3.5.7.9_s2_e6_c40_se0.5_nsw",
     "ir_r3_k3.5_a1.1_p1.1_s1_e6_c40_se0.5_nsw"),
    ("ir_r1_k3.5.7_s2_e6_c80_se0.25_nsw",
     "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e6_c80_se0.25_nsw"),
    ("ir_r1_k3_s1_e6_c120_se0.5_nsw",
     "ir_r3_k3.5.7.9_a1.1_p1.1_s1_e3_c120_se0.5_nsw"),
    ("ir_r1_k3.5.7.9_s2_e6_c200_se0.5_nsw",
     "ir_r3_k3.5.7.9_p1.1_s1_e6_c200_se0.5_nsw"),
)
_EDGETPU_V1 = (
    ("cn_r1_k1_s1_c16",),
    ("er_r1_k3_s2_e8_c32", "er_r3_k3_s1_e4_c32"),
    ("er_r1_k3_s2_e8_c48", "er_r3_k3_s1_e4_c48"),
    ("ir_r1_k3_s2_e8_c96", "ir_r3_k3_s1_e4_c96"),
    ("ir_r1_k3_s1_e8_c96_noskip", "ir_r3_k3_s1_e4_c96"),
    ("ir_r1_k5_s2_e8_c160", "ir_r3_k5_s1_e4_c160"),
    ("ir_r1_k3_s1_e8_c192",),
)


def _edgetpu_v2(chs, group_size):
    return (
        (f"cn_r1_k1_s1_c{chs[0]}",),
        (f"er_r1_k3_s2_e8_c{chs[1]}",
         f"er_r1_k3_s1_e4_gs{group_size}_c{chs[1]}"),
        (f"er_r1_k3_s2_e8_c{chs[2]}",
         f"er_r1_k3_s1_e4_gs{group_size}_c{chs[2]}",
         f"er_r1_k3_s1_e4_c{chs[2]}",
         f"er_r1_k3_s1_e4_gs{group_size}_c{chs[2]}"),
        (f"er_r1_k3_s2_e8_c{chs[3]}", f"ir_r3_k3_s1_e4_c{chs[3]}"),
        (f"ir_r1_k3_s1_e8_c{chs[4]}", f"ir_r3_k3_s1_e4_c{chs[4]}"),
        (f"ir_r1_k3_s2_e8_c{chs[5]}", f"ir_r3_k3_s1_e4_c{chs[5]}"),
        (f"ir_r1_k3_s1_e8_c{chs[6]}",),
    )


_TEST = (
    ("cn_r1_k3_s1_e1_c16_skip",),
    ("er_r1_k3_s2_e4_c24",),
    ("er_r1_k3_s2_e4_c32",),
    ("ir_r1_k3_s2_e4_c48_se0.25",),
    ("ir_r1_k3_s2_e4_c64_se0.25",),
)

# ---------------------------------------------------------------------------
# builder glue
# ---------------------------------------------------------------------------

_FACTORY_KEYS = ("pretrained_tag", "global_pool", "init_values", "remat",
                 "scan_blocks")


def _make(arch, cm=1.0, dm=1.0, *, divisor=8, round_limit=0.9,
          fix_first_last=False, depth_trunc="ceil", experts_multiplier=1,
          group_size=None, num_features=1280, scale_features=True,
          min_features=0, stem=32, fix_stem=False, stem_kernel=3,
          act="silu", norm="bn", norm_gs=8, se_kind="se", aa="", **cfg):
    """One registered entrypoint. num_features is scaled by cm when
    scale_features (parity with each reference generator's
    round_chs_fn(num_features))."""
    blocks = decode_arch_def(arch, dm, depth_trunc=depth_trunc,
                             experts_multiplier=experts_multiplier,
                             fix_first_last=fix_first_last,
                             group_size=group_size)
    nf = num_features
    if nf and scale_features:
        nf = round_channels(nf, cm, divisor, round_limit=round_limit)
    if min_features:
        nf = max(min_features, nf)

    def build(**kw):
        for k in _FACTORY_KEYS:
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        merged = dict(block_args=blocks, stem_size=stem, fix_stem=fix_stem,
                      stem_kernel_size=stem_kernel, num_features=nf,
                      act=act, norm=norm, norm_group_size=norm_gs,
                      se_kind=se_kind, aa=aa, round_mult=cm,
                      round_divisor=divisor, round_limit=round_limit, **cfg)
        merged.update(kw)
        return EffNet(**merged)

    return build


_V = {}  # name -> build fn

# mnasnet family (reference :1897-1958)
for _n, _c in [("mnasnet_050", 0.5), ("mnasnet_075", 0.75),
               ("mnasnet_100", 1.0), ("mnasnet_140", 1.4)]:
    _V[_n] = _make(_MNASNET_B1, _c)
for _n, _c in [("semnasnet_050", 0.5), ("semnasnet_075", 0.75),
               ("semnasnet_100", 1.0), ("semnasnet_140", 1.4)]:
    _V[_n] = _make(_MNASNET_A1, _c)
_V["mnasnet_small"] = _make(_MNASNET_SMALL, 1.0, stem=8)

# mobilenet v1/v2 (reference :1960-2030); v1 has no head conv by default
_V["mobilenetv1_100"] = _make(_MOBILENET_V1, 1.0, num_features=0,
                              act="relu6")
_V["mobilenetv1_100h"] = _make(_MOBILENET_V1, 1.0, num_features=1024,
                               min_features=1024, act="relu6")
_V["mobilenetv1_125"] = _make(_MOBILENET_V1, 1.25, num_features=0,
                              act="relu6")
for _n, _c in [("mobilenetv2_035", 0.35), ("mobilenetv2_050", 0.5),
               ("mobilenetv2_075", 0.75), ("mobilenetv2_100", 1.0),
               ("mobilenetv2_140", 1.4)]:
    _V[_n] = _make(_MOBILENET_V2, _c, min_features=1280, act="relu6")
_V["mobilenetv2_110d"] = _make(_MOBILENET_V2, 1.1, 1.2, fix_first_last=True,
                               fix_stem=True, scale_features=False,
                               act="relu6")
_V["mobilenetv2_120d"] = _make(_MOBILENET_V2, 1.2, 1.4, fix_first_last=True,
                               fix_stem=True, scale_features=False,
                               act="relu6")

_V["fbnetc_100"] = _make(_FBNETC, 1.0, stem=16, num_features=1984,
                         scale_features=False, act="relu")
_V["spnasnet_100"] = _make(_SPNASNET, 1.0, act="relu")

# efficientnet b0-b8 + l2 (reference :2049-2139); tf_ aliases share archs
_B_PARAMS = {"b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2),
             "b3": (1.2, 1.4), "b4": (1.4, 1.8), "b5": (1.6, 2.2),
             "b6": (1.8, 2.6), "b7": (2.0, 3.1), "b8": (2.2, 3.6),
             "l2": (4.3, 5.3)}
for _n, (_c, _d) in _B_PARAMS.items():
    _V[f"efficientnet_{_n}"] = _make(_EFFICIENTNET, _c, _d)
    _V[f"tf_efficientnet_{_n}"] = _make(_EFFICIENTNET, _c, _d)
for _n in ("b1", "b2", "b3"):
    _c, _d = _B_PARAMS[_n]
    _V[f"efficientnet_{_n}_pruned"] = _make(_EFFICIENTNET, _c, _d)

# norm-variant b0/b3 (reference :2140-2196)
_V["efficientnet_b0_gn"] = _make(_EFFICIENTNET, 1.0, 1.0, norm="gn",
                                 norm_gs=8)
_V["efficientnet_b0_g8_gn"] = _make(_EFFICIENTNET, 1.0, 1.0, group_size=8,
                                    norm="gn", norm_gs=8)
_V["efficientnet_b0_g16_evos"] = _make(_EFFICIENTNET, 1.0, 1.0,
                                       group_size=16, divisor=16,
                                       norm="evos", norm_gs=16)
_V["efficientnet_b3_gn"] = _make(_EFFICIENTNET, 1.2, 1.4, divisor=16,
                                 norm="gn", norm_gs=16)
_V["efficientnet_b3_g8_gn"] = _make(_EFFICIENTNET, 1.2, 1.4, group_size=8,
                                    divisor=16, norm="gn", norm_gs=16)
_V["efficientnet_blur_b0"] = _make(_EFFICIENTNET, 1.0, 1.0, aa="blur")

# edge (reference :2197-2233)
for _n, (_c, _d) in [("es", (1.0, 1.0)), ("em", (1.0, 1.1)),
                     ("el", (1.2, 1.4))]:
    _V[f"efficientnet_{_n}"] = _make(_EFFICIENTNET_EDGE, _c, _d, act="relu")
    _V[f"tf_efficientnet_{_n}"] = _make(_EFFICIENTNET_EDGE, _c, _d,
                                        act="relu")
_V["efficientnet_es_pruned"] = _make(_EFFICIENTNET_EDGE, 1.0, 1.0,
                                     act="relu")
_V["efficientnet_el_pruned"] = _make(_EFFICIENTNET_EDGE, 1.2, 1.4,
                                     act="relu")

# condconv (reference :2234-2262)
_V["efficientnet_cc_b0_4e"] = _make(_EFFICIENTNET_CC, 1.0, 1.0)
_V["efficientnet_cc_b0_8e"] = _make(_EFFICIENTNET_CC, 1.0, 1.0,
                                    experts_multiplier=2)
_V["efficientnet_cc_b1_8e"] = _make(_EFFICIENTNET_CC, 1.0, 1.1,
                                    experts_multiplier=2)
_V["tf_efficientnet_cc_b0_4e"] = _make(_EFFICIENTNET_CC, 1.0, 1.0)
_V["tf_efficientnet_cc_b0_8e"] = _make(_EFFICIENTNET_CC, 1.0, 1.0,
                                       experts_multiplier=2)
_V["tf_efficientnet_cc_b1_8e"] = _make(_EFFICIENTNET_CC, 1.0, 1.1,
                                       experts_multiplier=2)

# lite (reference :2263-2310)
_LITE_PARAMS = {"lite0": (1.0, 1.0), "lite1": (1.0, 1.1),
                "lite2": (1.1, 1.2), "lite3": (1.2, 1.4),
                "lite4": (1.4, 1.8)}
for _n, (_c, _d) in _LITE_PARAMS.items():
    for _p in ("efficientnet", "tf_efficientnet"):
        _V[f"{_p}_{_n}"] = _make(_EFFICIENTNET_LITE, _c, _d,
                                 fix_first_last=True, fix_stem=True,
                                 scale_features=False, act="relu6")

# efficientnetv2 (reference :2311-2419)
_V["efficientnetv2_rw_t"] = _make(_V2_S, 0.8, 0.9, stem=24)
_V["gc_efficientnetv2_rw_t"] = _make(_V2_S, 0.8, 0.9, stem=24, se_kind="gc")
_V["efficientnetv2_rw_s"] = _make(_V2_S_RW, 1.0, 1.0, stem=24,
                                  num_features=1792)
_V["efficientnetv2_rw_m"] = _make(_V2_S_RW, 1.2,
                                  (1.2,) * 4 + (1.6,) * 2, stem=24,
                                  num_features=1792)
_V["efficientnetv2_s"] = _make(_V2_S, 1.0, 1.0, stem=24)
_V["efficientnetv2_m"] = _make(_V2_M, 1.0, 1.0, stem=24,
                               scale_features=False)
_V["efficientnetv2_l"] = _make(_V2_L, 1.0, 1.0, scale_features=False)
_V["efficientnetv2_xl"] = _make(_V2_XL, 1.0, 1.0, scale_features=False)
_V["tf_efficientnetv2_s"] = _make(_V2_S, 1.0, 1.0, stem=24)
_V["tf_efficientnetv2_m"] = _make(_V2_M, 1.0, 1.0, stem=24,
                                  scale_features=False)
_V["tf_efficientnetv2_l"] = _make(_V2_L, 1.0, 1.0, scale_features=False)
_V["tf_efficientnetv2_xl"] = _make(_V2_XL, 1.0, 1.0, scale_features=False)
_V["tf_efficientnetv2_b0"] = _make(_V2_BASE, 1.0, 1.0, round_limit=0.0)
_V["tf_efficientnetv2_b1"] = _make(_V2_BASE, 1.0, 1.1, round_limit=0.0)
_V["tf_efficientnetv2_b2"] = _make(_V2_BASE, 1.1, 1.2, round_limit=0.0)
_V["tf_efficientnetv2_b3"] = _make(_V2_BASE, 1.2, 1.4, round_limit=0.0)

# efficientnet-x / -h (reference :2420-2459)
_V["efficientnet_x_b3"] = _make(_X_V1, 1.2, 1.4)
_V["efficientnet_x_b5"] = _make(_X_V1, 1.6, 2.2)
_V["efficientnet_h_b5"] = _make(_X_V2, 1.92, 2.2)

# mixnet (reference :2460-2520)
_V["mixnet_s"] = _make(_MIXNET_S, 1.0, stem=16, num_features=1536,
                       scale_features=False, act="relu")
_V["mixnet_m"] = _make(_MIXNET_M, 1.0, stem=24, num_features=1536,
                       scale_features=False, act="relu")
_V["mixnet_l"] = _make(_MIXNET_M, 1.3, stem=24, num_features=1536,
                       scale_features=False, act="relu")
_V["mixnet_xl"] = _make(_MIXNET_M, 1.6, 1.2, depth_trunc="round", stem=24,
                        num_features=1536, scale_features=False, act="relu")
_V["mixnet_xxl"] = _make(_MIXNET_M, 2.4, 1.3, depth_trunc="round", stem=24,
                         num_features=1536, scale_features=False,
                         act="relu")
_V["tf_mixnet_s"] = _make(_MIXNET_S, 1.0, stem=16, num_features=1536,
                          scale_features=False, act="relu")
_V["tf_mixnet_m"] = _make(_MIXNET_M, 1.0, stem=24, num_features=1536,
                          scale_features=False, act="relu")
_V["tf_mixnet_l"] = _make(_MIXNET_M, 1.3, stem=24, num_features=1536,
                          scale_features=False, act="relu")

# tinynet (reference :2521-2550)
for _n, _w, _d in [("a", 1.0, 1.2), ("b", 0.75, 1.1), ("c", 0.54, 0.85),
                   ("d", 0.54, 0.695), ("e", 0.51, 0.6)]:
    _V[f"tinynet_{_n}"] = _make(_EFFICIENTNET, _w, _d, depth_trunc="round",
                                fix_stem=True, min_features=1280)

# mobilenet-edgetpu (reference :1196-1283, :2551-2580)
_V["mobilenet_edgetpu_100"] = _make(_EDGETPU_V1, 1.0, scale_features=False,
                                    act="relu")
_V["mobilenet_edgetpu_v2_xs"] = _make(
    _edgetpu_v2((16, 32, 48, 96, 144, 160, 192), 64), 1.0,
    scale_features=False, act="relu")
_V["mobilenet_edgetpu_v2_s"] = _make(
    _edgetpu_v2((24, 48, 64, 128, 160, 192, 256), 64), 1.0, stem=64,
    stem_kernel=5, scale_features=False, act="relu")
_V["mobilenet_edgetpu_v2_m"] = _make(
    _edgetpu_v2((32, 64, 80, 160, 192, 240, 320), 64), 1.0, stem=64,
    stem_kernel=5, num_features=1344, scale_features=False, act="relu")
_V["mobilenet_edgetpu_v2_l"] = _make(
    _edgetpu_v2((32, 64, 96, 192, 240, 256, 384), 128), 1.0, stem=64,
    stem_kernel=7, num_features=1408, scale_features=False, act="relu")

# test configs (reference :1285-1307, :2700-2740)
_V["test_efficientnet"] = _make(_TEST, 1.0, 1.0, round_limit=0.0, stem=24,
                                num_features=256)
_V["test_efficientnet_gn"] = _make(_TEST, 1.0, 1.0, round_limit=0.0,
                                   stem=24, num_features=256, norm="gn",
                                   norm_gs=8)
_V["test_efficientnet_ln"] = _make(_TEST, 1.0, 1.0, round_limit=0.0,
                                   stem=24, num_features=256, norm="ln")
_V["test_efficientnet_evos"] = _make(_TEST, 1.0, 1.0, round_limit=0.0,
                                     stem=24, num_features=256, norm="evos",
                                     norm_gs=8)

_mod = sys.modules[__name__]
for _name, _fn in _V.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"EfficientNet-superfamily variant {_name!r} "
                   f"(reference efficientnet.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
