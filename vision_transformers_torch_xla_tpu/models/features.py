"""Feature extraction from intermediate blocks.

Capability parity with the reference's feature machinery
(models/_features.py FeatureInfo/hooks and ViT `forward_intermediates`,
reference vision_transformer.py:782-875): pull per-block token maps,
optionally reshaped to (B, H', W', C) feature grids for dense downstream
tasks. Implemented with flax's `sow`/`mutable` — no hooks, no graph surgery,
and XLA dead-code-eliminates untapped blocks' sows.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def forward_intermediates(
    model,
    variables,
    x: jax.Array,
    indices: Optional[Sequence[int]] = None,
    reshape: bool = False,
    norm: bool = False,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Run the model, returning (final_output, [intermediate token maps]).

    indices: block indices to keep (negative ok); default: all blocks.
    reshape: tokens -> (B, grid, grid, C) with prefix tokens dropped.
    """
    y, state = model.apply(variables, x, True, mutable=["intermediates"])
    inter = state["intermediates"]
    taps = {}

    def _collect(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                _collect(v, k)
            elif k.startswith("block_"):
                taps[int(k.split("_")[1])] = v[0] if isinstance(v, tuple) else v

    _collect(inter)
    order = sorted(taps)
    if indices is not None:
        order = [order[i] for i in indices]
    feats = [taps[i] for i in order]
    if reshape:
        npt = model.num_prefix_tokens
        g = model.img_size // model.patch_size
        feats = [f[:, npt:].reshape(f.shape[0], g, g, f.shape[-1]) for f in feats]
    return y, feats
