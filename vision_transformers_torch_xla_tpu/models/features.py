"""Feature extraction: per-block / per-stage intermediates for any trunk.

Capability parity with the reference's feature machinery
(reference models/_features.py:1-483 — FeatureInfo, feature_take_indices,
FeatureListNet/FeatureGetterNet — and ViT `forward_intermediates`,
reference vision_transformer.py:782-875). The reference rewrites module
graphs or registers forward hooks; neither concept exists (or is needed)
under jax. Here every trunk sows its stage-boundary activations into the
flax "intermediates" collection:

  * transformer trunks (vit.py) sow per-block token maps as ``block_{i}``;
  * stage-structured trunks (resnet, convnext, effnet_builder, byobnet,
    swin, swin_v2, metaformer, regnet, resnetv2, densenet, cspnet, vgg,
    nfnet, maxvit, vovnet, pvt_v2, ...) sow per-stage feature maps as
    ``stage_{i}``.

A plain ``model.apply(vars, x)`` never materialises the taps: flax only
records sows when the "intermediates" collection is passed as mutable, and
XLA dead-code-eliminates the untapped values, so feature support is free
for classification. ``extract_features`` runs the model once and returns
(final_output, selected feature maps); ``get_feature_info`` derives the
FeatureInfo table (channels + reduction per tap) via ``jax.eval_shape`` —
zero FLOPs, zero compiles.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

OutIndices = Optional[Union[int, Sequence[int]]]


def feature_take_indices(num_features: int,
                         indices: OutIndices = None) -> Tuple[List[int], int]:
    """Resolve ``indices`` to absolute tap indices.

    Semantics match reference models/_features.py:28-67
    (feature_take_indices): None -> all taps; int n -> last n taps;
    sequence -> those taps, negatives counted from the end.
    Returns (absolute indices, max index).
    """
    if indices is None:
        take = list(range(num_features))
    elif isinstance(indices, int):
        if not 0 < indices <= num_features:
            raise ValueError(
                f"last-n ({indices}) out of range (1..{num_features})")
        take = list(range(num_features - indices, num_features))
    else:
        take = []
        for i in indices:
            idx = num_features + i if i < 0 else i
            if not 0 <= idx < num_features:
                raise ValueError(
                    f"feature index {i} out of range (0..{num_features - 1})")
            take.append(idx)
    return take, max(take)


class FeatureInfo:
    """Per-tap metadata table (reference models/_features.py:81-160).

    ``info`` is a list of dicts with at least ``num_chs`` (channels),
    ``reduction`` (input-to-tap spatial downsampling factor) and
    ``module`` (tap name, e.g. ``stage_2``). ``out_indices`` selects which
    taps the convenience accessors report.
    """

    def __init__(self, info: List[Dict[str, Any]],
                 out_indices: OutIndices = None):
        for i, fi in enumerate(info):
            assert fi.get("num_chs", 0) > 0 and "reduction" in fi \
                and "module" in fi
            fi.setdefault("index", i)
        self.info = info
        self.out_indices, _ = feature_take_indices(len(info), out_indices)

    def from_other(self, out_indices: OutIndices) -> "FeatureInfo":
        return FeatureInfo([dict(fi) for fi in self.info], out_indices)

    def get(self, key: str, idx: Optional[Union[int, Sequence[int]]] = None):
        if idx is None:
            return [self.info[i][key] for i in self.out_indices]
        if isinstance(idx, (tuple, list)):
            return [self.info[i][key] for i in idx]
        return self.info[idx][key]

    def channels(self, idx=None):
        return self.get("num_chs", idx)

    def reduction(self, idx=None):
        return self.get("reduction", idx)

    def module_name(self, idx=None):
        return self.get("module", idx)

    def get_dicts(self, keys: Optional[Sequence[str]] = None, idx=None):
        take = self.out_indices if idx is None else (
            idx if isinstance(idx, (tuple, list)) else [idx])
        if keys is None:
            return [self.info[i] for i in take]
        return [{k: self.info[i][k] for k in keys} for i in take]

    def __len__(self):
        return len(self.info)


# --------------------------------------------------------------------- taps

def _collect_taps(inter: Dict[str, Any], prefix: str) -> List[jax.Array]:
    """Pull ``{prefix}_{i}`` sows out of an intermediates tree, in order."""
    taps: Dict[int, Any] = {}

    def walk(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v)
            elif k.startswith(prefix + "_"):
                tail = k.rsplit("_", 1)[1]
                if tail.isdigit():
                    taps[int(tail)] = v[0] if isinstance(v, (tuple, list)) \
                        else v

    walk(inter)
    return [taps[i] for i in sorted(taps)]


def _run_with_taps(model, variables, x, deterministic: bool = True):
    """One forward pass recording intermediates; returns (y, ordered taps).

    Prefers stage taps (conv/hybrid trunks); falls back to block taps
    (transformer trunks).
    """
    y, state = model.apply(variables, x, deterministic,
                           mutable=["intermediates"])
    inter = state.get("intermediates", {})
    taps = _collect_taps(inter, "stage")
    if not taps:
        taps = _collect_taps(inter, "block")
    if not taps:
        raise ValueError(
            f"{type(model).__name__} sows no 'stage_*'/'block_*' "
            f"intermediates — no feature taps available")
    return y, taps


def extract_features(model, variables, x,
                     out_indices: OutIndices = None,
                     deterministic: bool = True,
                     ) -> Tuple[jax.Array, List[jax.Array]]:
    """Run ``model`` once, returning (final_output, selected feature maps).

    The functional analogue of reference FeatureListNet
    (models/_features.py:268-344): conv trunks yield (B, H_i, W_i, C_i)
    pyramids (NHWC — transpose for NCHW consumers), transformer trunks
    yield (B, N, C) token maps. ``out_indices`` follows
    feature_take_indices semantics (None=all, int=last n, list w/ negatives).
    """
    y, taps = _run_with_taps(model, variables, x, deterministic)
    take, _ = feature_take_indices(len(taps), out_indices)
    return y, [taps[i] for i in take]


def get_feature_info(model, variables, input_shape: Sequence[int],
                     out_indices: OutIndices = None,
                     dtype=jnp.float32) -> FeatureInfo:
    """Derive the FeatureInfo table via ``jax.eval_shape`` (zero compute).

    ``input_shape`` is the full NHWC input shape, batch included.
    Reduction is input-height / tap-height for spatial taps; for token
    taps (B, N, C) the grid is inferred from the token count (prefix
    tokens, if any, are counted out via ``model.num_prefix_tokens``).
    """
    x = jax.ShapeDtypeStruct(tuple(input_shape), dtype)
    _, taps = jax.eval_shape(
        lambda v, xx: _run_with_taps(model, v, xx, True), variables, x)
    h_in = input_shape[1]
    info = []
    for i, t in enumerate(taps):
        if len(t.shape) == 4:                       # (B, H, W, C) spatial
            red = max(1, round(h_in / t.shape[1]))
        else:                                       # (B, N, C) tokens
            npt = getattr(model, "num_prefix_tokens", 0)
            grid = max(1, round(math.sqrt(max(1, t.shape[1] - npt))))
            red = max(1, round(h_in / grid))
        info.append(dict(num_chs=int(t.shape[-1]), reduction=int(red),
                         module=f"stage_{i}" if len(t.shape) == 4
                         else f"block_{i}"))
    return FeatureInfo(info, out_indices)


def shape_signature(model, hw: int, with_params: bool = False):
    """Structural fingerprint of a model at input (1, hw, hw, 3): per-tap
    feature shapes plus the logits shape, derived with jax.eval_shape
    (zero compiles, zero FLOPs).

    Used by the golden-shape audit (tools/gen_golden_shapes.py /
    tests/test_shape_audit.py): a misplaced stride, pool, or downsample
    changes a tap or logits shape even when the param count is untouched.
    Returns [hw, [[tap shape...], ...], [logits shape]]; the tap list is
    empty for trunks that sow no stage/block intermediates.

    with_params=True also returns the total parameter count from the SAME
    single trace — init_with_output(mutable=True) yields output, params,
    and sown intermediates in one pass, so the param and shape audits
    share one trace per name instead of three (r5 suite-time work).
    """
    import numpy as np

    x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)
    y, vs = jax.eval_shape(
        lambda xx: model.init_with_output(
            {"params": jax.random.key(0), "droppath": jax.random.key(1)},
            xx, True, mutable=True), x)
    inter = vs.get("intermediates", {})
    taps = _collect_taps(inter, "stage") or _collect_taps(inter, "block")
    sig = [hw, [list(t.shape) for t in taps], list(y.shape)]
    if with_params:
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vs["params"]))
        return sig, n
    return sig


class FeatureListNet:
    """features_only wrapper (reference models/_features.py FeatureListNet).

    Functional stand-in for ``create_model(name, features_only=True)``:
    holds an (uninitialized) trunk plus ``out_indices`` and applies to a
    list of feature maps. ``init`` matches the wrapped module's signature,
    so the wrapper is a drop-in for training-loop param handling.

        net = create_model('resnet50', features_only=True, out_indices=(1, 3))
        vars_ = net.init(rngs, x)
        feats = net.apply(vars_, x)        # [ (B,28,28,512), (B,7,7,2048) ]
        net.feature_info(vars_, x.shape)   # channels / reductions
    """

    def __init__(self, net, out_indices: OutIndices = None):
        self.net = net
        self.out_indices = out_indices

    def init(self, rngs, x, deterministic: bool = True):
        return self.net.init(rngs, x, deterministic)

    def apply(self, variables, x, deterministic: bool = True,
              **kwargs) -> List[jax.Array]:
        _, feats = extract_features(self.net, variables, x,
                                    out_indices=self.out_indices,
                                    deterministic=deterministic)
        return feats

    def __call__(self, variables, x, deterministic: bool = True):
        return self.apply(variables, x, deterministic)

    def feature_info(self, variables, input_shape: Sequence[int],
                     dtype=jnp.float32) -> FeatureInfo:
        return get_feature_info(self.net, variables, input_shape,
                                out_indices=self.out_indices, dtype=dtype)


# ---------------------------------------------------- ViT intermediates API

def forward_intermediates(
    model,
    variables,
    x: jax.Array,
    indices: OutIndices = None,
    reshape: bool = False,
    norm: bool = False,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Run the model, returning (final_output, [intermediate maps]).

    Parity with reference vision_transformer.py:782-875
    (`forward_intermediates`). indices: taps to keep (None=all, int=last n,
    list w/ negatives). reshape: ViT token maps -> (B, grid, grid, C) with
    prefix tokens dropped (spatial stage taps are returned as-is).
    """
    y, taps = _run_with_taps(model, variables, x, deterministic=True)
    take, _ = feature_take_indices(len(taps), indices)
    feats = [taps[i] for i in take]
    if reshape:
        npt = getattr(model, "num_prefix_tokens", 0)
        g = model.img_size // model.patch_size
        feats = [f[:, npt:].reshape(f.shape[0], g, g, f.shape[-1])
                 if f.ndim == 3 else f for f in feats]
    return y, feats
