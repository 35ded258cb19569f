"""HardCoRe-NAS in Flax, NHWC.

Parity with the reference's dormant hardcorenas.py (156 LoC; SURVEY
§2.2): six NAS-discovered MobileNetV3-style architectures expressed as
timm arch-def strings (`ir_r1_k5_s2_e3_c24_nre_se0.25`, ...), decoded
here into the MobileNetV3 trunk's block spec (kernel, absolute expand,
out, SE, act, stride) with a 32-wide stem and 960->1280 head.
"""
from __future__ import annotations

from vision_transformers_torch_xla_tpu.models.mobilenetv3 import (
    MobileNetV3,
    _round_ch,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _decode(arch_def, stem=32):
    """timm arch strings -> (k, exp_abs, out, se, act, stride) tuples.
    The final 'cn_...' conv becomes the trunk head_ch."""
    blocks = []
    in_ch = stem
    head_ch = 960
    for stage in arch_def:
        for bs in stage:
            parts = bs.split("_")
            kind = parts[0]
            opt = {"se": 0.0, "nre": False}
            k = s = e = c = None
            for tok in parts[1:]:
                if tok.startswith("r"):
                    continue  # r1 always
                if tok.startswith("k"):
                    k = int(tok[1:])
                elif tok.startswith("s") and tok[1:].replace(".", "").isdigit() and not tok.startswith("se"):
                    s = int(tok[1:])
                elif tok.startswith("e"):
                    e = float(tok[1:])
                elif tok.startswith("c"):
                    c = int(tok[1:])
                elif tok.startswith("se"):
                    opt["se"] = float(tok[2:])
                elif tok == "nre":
                    opt["nre"] = True
            if kind == "cn":
                head_ch = c
                continue
            act = "re" if opt["nre"] else "hs"
            exp = _round_ch(in_ch * e)
            blocks.append((k, exp, c, opt["se"] > 0, act, s))
            in_ch = c
    return tuple(blocks), head_ch


def _hardcorenas(arch_def):
    blocks, head_ch = _decode(arch_def)

    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        return MobileNetV3(blocks=blocks, stem_ch=32, head_ch=head_ch,
                           head_hidden=1280, **kw)

    return build


_ARCHS = {
    "hardcorenas_a": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_se0.25"],
        ["ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e6_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e6_c80_se0.25", "ir_r1_k5_s1_e6_c80_se0.25"],
        ["ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"]],
    "hardcorenas_b": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_se0.25",
         "ir_r1_k3_s1_e3_c24_nre"],
        ["ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre",
         "ir_r1_k5_s1_e3_c40_nre"],
        ["ir_r1_k5_s2_e3_c80", "ir_r1_k5_s1_e3_c80",
         "ir_r1_k3_s1_e3_c80", "ir_r1_k3_s1_e3_c80"],
        ["ir_r1_k5_s1_e3_c112", "ir_r1_k3_s1_e3_c112",
         "ir_r1_k3_s1_e3_c112", "ir_r1_k3_s1_e3_c112"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k3_s1_e3_c192_se0.25"],
        ["cn_r1_k1_s1_c960"]],
    "hardcorenas_c": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre", "ir_r1_k5_s1_e3_c24_nre_se0.25"],
        ["ir_r1_k5_s2_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre",
         "ir_r1_k5_s1_e3_c40_nre", "ir_r1_k5_s1_e3_c40_nre"],
        ["ir_r1_k5_s2_e4_c80", "ir_r1_k5_s1_e6_c80_se0.25",
         "ir_r1_k3_s1_e3_c80", "ir_r1_k3_s1_e3_c80"],
        ["ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k3_s1_e3_c112",
         "ir_r1_k3_s1_e3_c112", "ir_r1_k3_s1_e3_c112"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k3_s1_e3_c192_se0.25"],
        ["cn_r1_k1_s1_c960"]],
    "hardcorenas_d": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre_se0.25", "ir_r1_k5_s1_e3_c24_nre_se0.25"],
        ["ir_r1_k5_s2_e3_c40_nre_se0.25",
         "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k3_s1_e3_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e4_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25",
         "ir_r1_k3_s1_e3_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25"],
        ["ir_r1_k3_s1_e4_c112_se0.25", "ir_r1_k5_s1_e4_c112_se0.25",
         "ir_r1_k3_s1_e3_c112_se0.25", "ir_r1_k5_s1_e3_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k3_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"]],
    "hardcorenas_e": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre_se0.25", "ir_r1_k5_s1_e3_c24_nre_se0.25"],
        ["ir_r1_k5_s2_e6_c40_nre_se0.25",
         "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k5_s1_e4_c40_nre_se0.25",
         "ir_r1_k3_s1_e3_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e4_c80_se0.25", "ir_r1_k3_s1_e6_c80_se0.25"],
        ["ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25",
         "ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k5_s1_e3_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k5_s1_e6_c192_se0.25", "ir_r1_k3_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"]],
    "hardcorenas_f": [
        ["ds_r1_k3_s1_e1_c16_nre"],
        ["ir_r1_k5_s2_e3_c24_nre_se0.25", "ir_r1_k5_s1_e3_c24_nre_se0.25"],
        ["ir_r1_k5_s2_e6_c40_nre_se0.25",
         "ir_r1_k5_s1_e6_c40_nre_se0.25"],
        ["ir_r1_k5_s2_e6_c80_se0.25", "ir_r1_k5_s1_e6_c80_se0.25",
         "ir_r1_k3_s1_e3_c80_se0.25", "ir_r1_k3_s1_e3_c80_se0.25"],
        ["ir_r1_k3_s1_e6_c112_se0.25", "ir_r1_k5_s1_e6_c112_se0.25",
         "ir_r1_k5_s1_e6_c112_se0.25", "ir_r1_k3_s1_e3_c112_se0.25"],
        ["ir_r1_k5_s2_e6_c192_se0.25", "ir_r1_k5_s1_e6_c192_se0.25",
         "ir_r1_k3_s1_e6_c192_se0.25", "ir_r1_k3_s1_e6_c192_se0.25"],
        ["cn_r1_k1_s1_c960"]],
}

import sys  # noqa: E402

_mod = sys.modules[__name__]
for _name, _arch in _ARCHS.items():
    _fn = _hardcorenas(_arch)
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"HardCoRe-NAS variant {_name!r} (reference "
                   f"hardcorenas.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
