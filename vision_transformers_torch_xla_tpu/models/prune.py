"""Channel pruning for the ViT trunk.

Parity with the reference's `models/_prune.py:116` `adapt_model_from_string`
(+ `_pruned/*.txt` recipes): shrink a trained model's channel counts and
carry the surviving weights over. The reference rebuilds torch modules
in-place from a text spec; here — params being a plain tree — pruning is a
pure function from (module, params) to a slimmer (module, params):

* importance = L2 norm of each MLP hidden unit's fan-in column + fan-out
  row (magnitude pruning)
* kept widths are rounded up to a multiple of 8 so the pruned matmuls
  still tile cleanly onto the MXU (TPU lane alignment) — a constraint the
  CUDA-oriented reference has no reason to respect
* the slimmed module uses `VisionTransformer.mlp_hidden` per-block width
  overrides; everything else (attention, embeddings, head) is untouched

Spec strings: ``"keep=0.5"`` (uniform keep fraction) or explicit
per-block widths ``"768,768,640,..."`` — the moral equivalent of the
reference's `_pruned/*.txt` channel tables.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np

__all__ = ["prune_vit_mlp", "prune_model", "adapt_model_from_string"]


def _round_up8(n: int) -> int:
    return max(8, (n + 7) // 8 * 8)


def _as_np(x):
    return np.asarray(getattr(x, "unbox", lambda: x)())


def prune_vit_mlp(params: dict, keep: float = 0.5,
                  widths: Sequence[int] = None) -> Tuple[dict, list]:
    """Magnitude-prune each transformer block's MLP hidden units.

    Returns (new_params, per_block_hidden). `widths` (explicit per-block
    hidden sizes) overrides `keep`.
    """
    from vision_transformers_torch_xla_tpu.models.pretrained import (
        nest_flat,
        flatten_tree,
    )

    flat = flatten_tree(params)
    blocks = sorted({k.split("/")[0] for k in flat
                     if k.startswith("blocks_") and "/mlp/" in k},
                    key=lambda s: int(s.split("_")[1]))
    if not blocks:
        raise ValueError("no blocks_*/mlp params found — not a ViT tree?")
    hiddens = []
    for bi, blk in enumerate(blocks):
        fc1_k = flat[f"{blk}/mlp/fc1/kernel"]  # (embed, hidden)
        fc2_k = flat[f"{blk}/mlp/fc2/kernel"]  # (hidden, embed)
        hidden = fc1_k.shape[1]
        n_keep = int(widths[bi]) if widths is not None else \
            _round_up8(int(round(hidden * keep)))
        n_keep = min(n_keep, hidden)
        score = (np.linalg.norm(_as_np(fc1_k), axis=0) +
                 np.linalg.norm(_as_np(fc2_k), axis=1))
        idx = np.sort(np.argsort(score)[::-1][:n_keep])
        flat[f"{blk}/mlp/fc1/kernel"] = _as_np(fc1_k)[:, idx]
        if f"{blk}/mlp/fc1/bias" in flat:
            flat[f"{blk}/mlp/fc1/bias"] = _as_np(
                flat[f"{blk}/mlp/fc1/bias"])[idx]
        flat[f"{blk}/mlp/fc2/kernel"] = _as_np(fc2_k)[idx, :]
        hiddens.append(n_keep)
    return nest_flat({k: _as_np(v) for k, v in flat.items()}), hiddens


def prune_model(module: Any, params: dict, keep: float = 0.5,
                widths: Sequence[int] = None) -> Tuple[Any, dict]:
    """(module, params) -> (slimmer module, pruned params)."""
    new_params, hiddens = prune_vit_mlp(params, keep, widths)
    return module.clone(mlp_hidden=tuple(hiddens),
                        scan_blocks=False), new_params


def adapt_model_from_string(module: Any, params: dict,
                            spec: str) -> Tuple[Any, dict]:
    """Reference-API-shaped entry (models/_prune.py:116): spec is either
    'keep=<fraction>' or a comma list of per-block hidden widths."""
    spec = spec.strip()
    if spec.startswith("keep="):
        return prune_model(module, params, keep=float(spec[5:]))
    widths = [int(s) for s in spec.split(",") if s.strip()]
    return prune_model(module, params, widths=widths)
