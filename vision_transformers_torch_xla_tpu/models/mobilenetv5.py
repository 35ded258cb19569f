"""MobileNetV5 in Flax, NHWC.

Parity with the reference's dormant mobilenetv5.py (826 LoC; SURVEY §2.2):
UIR + multi-query-attention trunks decoded from timm arch strings with
RMSNorm everywhere, GELU, layer-scale 1e-5, and the Multi-Scale Fusion
Adapter head (reference mobilenetv5.py:26-114) that upsamples the last
three stage outputs to a common resolution, concatenates, runs a UIR-style
FFN to 2048 features, and average-pools to a 16x16 token grid.

`mobilenetv5_300m_enc` is the encoder variant (returns pooled features,
no classifier — num_classes=0), matching the reference's
MobileNetV5Encoder (:394-470).
"""
from __future__ import annotations

import sys

from vision_transformers_torch_xla_tpu.models.effnet_builder import (
    EffNet,
    decode_arch_def,
)
from vision_transformers_torch_xla_tpu.models.registry import register_model

__all__ = []


def _stage2(c, heads, kv, n_attn, kd=64):
    """Stage-2/3 pattern: UIR lead-in + alternating MQA/FFN pairs."""
    v = f"_v{kv}" if kv > 1 else ""
    out = []
    for _ in range(n_attn):
        out.append(f"mqa_r1_k3_h{heads}_s1{v}_d{kd}_c{c}")
        out.append(f"uir_r1_a0_k0_s1_e2_c{c}")
    return tuple(out)


_MNV5_300M = (
    ("er_r1_k3_s2_e4_c128", "er_r1_k3_s1_e4_c128", "er_r1_k3_s1_e4_c128"),
    ("uir_r1_a3_k5_s2_e6_c256", "uir_r1_a5_k0_s1_e4_c256",
     "uir_r1_a3_k0_s1_e4_c256", "uir_r1_a5_k0_s1_e4_c256",
     "uir_r1_a3_k0_s1_e4_c256"),
    ("uir_r1_a5_k5_s2_e6_c640",) + ("uir_r1_a5_k0_s1_e4_c640",) * 7
    + ("uir_r1_a0_k0_s1_e1_c640",) + _stage2(640, 12, 2, 13),
    ("uir_r1_a5_k5_s2_e6_c1280",) + _stage2(1280, 16, 1, 18, kd=96),
)
_MNV5_BASE = (
    ("er_r1_k3_s2_e4_c128", "er_r1_k3_s1_e4_c128", "er_r1_k3_s1_e4_c128"),
    ("uir_r1_a3_k5_s2_e6_c256", "uir_r1_a5_k0_s1_e4_c256",
     "uir_r1_a3_k0_s1_e4_c256", "uir_r1_a5_k0_s1_e4_c256",
     "uir_r1_a3_k0_s1_e4_c256"),
    ("uir_r1_a5_k5_s2_e6_c512", "uir_r1_a5_k0_s1_e4_c512",
     "uir_r1_a5_k0_s1_e4_c512", "uir_r1_a0_k0_s1_e1_c512")
    + _stage2(512, 8, 2, 6),
    ("uir_r1_a5_k5_s2_e6_c1024",) + _stage2(1024, 16, 1, 7),
)


def _mnv5(arch, *, encoder=False):
    blocks = decode_arch_def(arch)

    def build(**kw):
        for k in ("pretrained_tag", "global_pool", "init_values", "remat",
                  "scan_blocks"):
            kw.pop(k, None)
        kw = {k: v for k, v in kw.items() if v is not None}
        merged = dict(block_args=blocks, stem_size=64, stem_kernel_size=3,
                      num_features=2048, head_style="msfa",
                      msfa_indices=(-3, -2, -1), msfa_output_resolution=16,
                      act="gelu", norm="rms", bn_eps=1e-6,
                      layer_scale_init_value=1e-5, img_size=256)
        if encoder:
            merged["num_classes"] = 0
        merged.update(kw)
        return EffNet(**merged)

    return build


_V = {
    "mobilenetv5_300m": _mnv5(_MNV5_300M),
    "mobilenetv5_300m_enc": _mnv5(_MNV5_300M, encoder=True),
    "mobilenetv5_base": _mnv5(_MNV5_BASE),
}

_mod = sys.modules[__name__]
for _name, _fn in _V.items():
    _fn.__name__ = _name
    _fn.__qualname__ = _name
    _fn.__doc__ = (f"MobileNetV5 variant {_name!r} (reference "
                   f"mobilenetv5.py registry surface).")
    setattr(_mod, _name, register_model(_fn))
