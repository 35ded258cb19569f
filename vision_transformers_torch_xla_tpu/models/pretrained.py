"""Pretrained-weight resolution, loading, and merging.

Reference parity (minus the network — this is a zero-egress environment):

* ``models/_builder.py:551`` ``build_model_with_cfg`` / ``load_pretrained``:
  resolve a pretrained cfg for a registry name, load the state dict, run a
  per-family ``checkpoint_filter_fn``, adapt the classifier/pos-embed, and
  merge into the model's params.
* ``models/_factory.py:20-43``: ``hf-hub:`` and ``local-dir:`` source
  prefixes. ``local-dir:`` reads ``config.json`` + a weights file from a
  directory on disk; ``hf-hub:`` resolves through a *local* HF-style cache
  (no downloads).
* ``models/_hub.py``: ``load_model_config_from_hf`` config schema
  (``architecture`` / ``model_args`` / ``pretrained_cfg`` keys) and the
  save-side (``save_local_dir`` here mirrors ``save_for_hf``'s on-disk
  layout with an ``.npz`` weights file instead of safetensors).

Design note (TPU-native): the factory returns an *uninitialized* Flax
module, so pretrained weights cannot be loaded "into the model" the way
torch does. Instead ``create_model(pretrained=True)`` eagerly loads +
filters the state dict (fails fast on a missing file) and attaches it to
the module; the caller merges it into freshly-initialized params with
``apply_pretrained(module, params)``. ``launch/main.py`` does this
automatically after ``model.init``.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

# weights filenames probed inside a local-dir / hub snapshot, in order
# (reference _hub.py checks safetensors then pytorch_model.bin)
WEIGHT_FILES = (
    "model.npz",
    "model.safetensors",
    "pytorch_model.bin",
    "pytorch_model.pth",
    "checkpoint.pth",
)

# per-family checkpoint filter fns: registry-name prefix -> converter from
# a raw torch state_dict to our Flax params tree (reference
# checkpoint_filter_fn, e.g. vision_transformer.py:1385)
_filter_fns: Dict[str, Callable[[dict], dict]] = {}


def register_filter_fn(prefix: str, fn: Callable[[dict], dict]) -> None:
    _filter_fns[prefix] = fn


def filter_fn_for(model_name: str) -> Optional[Callable[[dict], dict]]:
    best = None
    for prefix, fn in _filter_fns.items():
        if model_name.startswith(prefix):
            if best is None or len(prefix) > len(best[0]):
                best = (prefix, fn)
    return best[1] if best else None


# ---------------------------------------------------------------------------
# tree <-> flat helpers (npz files store '/'-joined flat keys)

def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if hasattr(tree, "unbox"):  # flax nn.Partitioned sharding metadata
        tree = tree.unbox()
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def nest_flat(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


# ---------------------------------------------------------------------------
# state-dict loading

def load_state_dict(path: str, model_name: str = "") -> Dict[str, Any]:
    """Load model weights from any supported on-disk format.

    Formats: ``.npz`` (flat '/'-keyed Flax tree — this framework's native
    export format), ``.safetensors`` (same key layout), torch pickles
    (``.pth/.pt/.bin`` — run through the per-family filter fn), or an
    Orbax checkpoint directory produced by this framework's trainer.
    """
    if os.path.isdir(path):
        weights = _find_weights_file(path)
        if weights is not None:
            return load_state_dict(weights, model_name)
        # fall through: Orbax checkpoint dir from our own trainer
        from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
            load_reference_checkpoint,
        )

        return load_reference_checkpoint(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            return nest_flat({k: z[k] for k in z.files})
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file
        except ImportError as e:  # pragma: no cover - optional dep
            raise ImportError(
                "safetensors is not installed; convert the file to .npz or "
                "a torch .pth") from e
        return nest_flat(load_file(path))
    # torch pickle: apply the family filter fn when one is registered,
    # else the architecture auto-detecting converter
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt
    if isinstance(ckpt, dict):
        for key in ("model", "module", "state_dict", "params"):
            if key in ckpt and isinstance(ckpt[key], dict):
                sd = ckpt[key]
                break
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    fn = filter_fn_for(model_name)
    if fn is not None:
        return fn(sd)
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc

    arch = tc.detect_architecture(sd)
    converters = {
        "swin": tc.convert_swin_state_dict,
        "resnet": tc.convert_resnet_state_dict,      # {'params','batch_stats'}
        "efficientnet": tc.convert_efficientnet_state_dict,
        "mobilenetv3": tc.convert_mobilenetv3_state_dict,
        "convnext": tc.convert_convnext_state_dict,
        "mixer": tc.convert_mixer_state_dict,
        "vit": tc.convert_vit_state_dict,
    }
    return converters[arch](sd)


def _find_weights_file(directory: str) -> Optional[str]:
    for name in WEIGHT_FILES:
        p = os.path.join(directory, name)
        if os.path.exists(p):
            return p
    return None


# ---------------------------------------------------------------------------
# local-dir / hf-hub config resolution

def load_local_dir(path: str) -> Tuple[str, dict, dict]:
    """'local-dir:<path>' source: read config.json + weights from a dir.

    Returns (architecture, model_args, pretrained_cfg-with-file). Config
    schema matches reference _hub.py load_model_config_from_hf:
    {"architecture": ..., "model_args": {...}, "pretrained_cfg": {...}}.
    """
    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"local-dir: no config.json under {path!r}")
    with open(cfg_path) as f:
        cfg = json.load(f)
    arch = cfg.get("architecture")
    if not arch:
        raise ValueError(f"local-dir: {cfg_path} lacks an 'architecture' key")
    pretrained_cfg = dict(cfg.get("pretrained_cfg", {}))
    if "file" not in pretrained_cfg:
        weights = _find_weights_file(path)
        if weights is None:
            raise FileNotFoundError(
                f"local-dir: no weights file under {path!r} "
                f"(looked for {', '.join(WEIGHT_FILES)})")
        pretrained_cfg["file"] = weights
    elif not os.path.isabs(pretrained_cfg["file"]):
        pretrained_cfg["file"] = os.path.join(path, pretrained_cfg["file"])
    return arch, dict(cfg.get("model_args", {})), pretrained_cfg


def resolve_hf_hub(repo_id: str) -> Tuple[str, dict, dict]:
    """'hf-hub:org/repo' resolved through a LOCAL HF-style cache only.

    Zero-egress: no download is attempted. Probes, in order:
    $VTX_HUB_CACHE/<org--repo>/, then the HF cache layout
    ($HF_HUB_CACHE or ~/.cache/huggingface/hub)/models--org--repo/snapshots/*/.
    """
    candidates = []
    vtx_cache = os.environ.get("VTX_HUB_CACHE")
    if vtx_cache:
        candidates.append(os.path.join(vtx_cache, repo_id.replace("/", "--")))
        candidates.append(os.path.join(vtx_cache, repo_id))
    hf_cache = os.environ.get(
        "HF_HUB_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "huggingface", "hub"))
    snap_root = os.path.join(
        hf_cache, "models--" + repo_id.replace("/", "--"), "snapshots")
    if os.path.isdir(snap_root):
        for snap in sorted(os.listdir(snap_root)):
            candidates.append(os.path.join(snap_root, snap))
    for cand in candidates:
        if os.path.isdir(cand) and os.path.exists(
                os.path.join(cand, "config.json")):
            return load_local_dir(cand)
    raise FileNotFoundError(
        f"hf-hub:{repo_id} not found in any local cache (this environment "
        f"has no network egress). Place the repo's config.json + weights "
        f"under $VTX_HUB_CACHE/{repo_id.replace('/', '--')}/ or use "
        f"'local-dir:<path>'.")


def save_local_dir(path: str, architecture: str, params: Any,
                   model_args: Optional[dict] = None,
                   pretrained_cfg: Optional[dict] = None) -> str:
    """Write a 'local-dir:' loadable directory (config.json + model.npz).

    Save-side counterpart of load_local_dir; mirrors the on-disk layout of
    reference _hub.py save_for_hf with an npz weights file.
    """
    os.makedirs(path, exist_ok=True)
    flat = flatten_tree(params)
    np.savez(os.path.join(path, "model.npz"),
             **{k: np.asarray(v) for k, v in flat.items()})
    cfg = {"architecture": architecture,
           "model_args": model_args or {},
           "pretrained_cfg": {**(pretrained_cfg or {}), "file": "model.npz"}}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    return path


def generate_readme(model_card: dict, model_name: str) -> str:
    """Model-card README text (reference _hub.py:460-520 generate_readme
    front-matter semantics: tags, library, license, datasets, sections)."""
    card = model_card or {}
    tags = card.get("tags") or ["image-classification", "vtx"]
    lines = ["---"]
    lines += ["tags:"] + [f"- {t}" for t in tags]
    lines.append(f"library_name: {card.get('library_name', 'vtx')}")
    lines.append(f"license: {card.get('license', 'apache-2.0')}")
    details = card.get("details", {})
    ds = details.get("Dataset")
    if ds:
        lines.append("datasets:")
        for d in ds if isinstance(ds, (tuple, list)) else [ds]:
            lines.append(f"- {d.lower()}")
    lines.append("---")
    lines.append(f"# Model card for {model_name}")
    if "description" in card:
        lines.append("")
        lines.append(card["description"])
    if details:
        lines.append("")
        lines.append("## Model Details")
        for k, v in details.items():
            lines.append(f"- **{k}:** {v}")
    return "\n".join(lines) + "\n"


def push_to_hf_hub(params: Any, architecture: str, repo_id: str,
                   commit_message: str = "Add model",
                   token: Optional[str] = None,
                   private: bool = False,
                   model_config: Optional[dict] = None,
                   model_card: Optional[dict] = None,
                   model_args: Optional[dict] = None,
                   pretrained_cfg: Optional[dict] = None) -> str:
    """Publish weights + config + model card to the HF hub (reference
    _hub.py:396-457 push_to_hf_hub).

    Two transports, picked automatically:
      * ``huggingface_hub`` importable AND a token available — real push
        via create_repo + upload_folder.
      * otherwise (this image has zero egress) — "push" into the local
        HF-style cache that ``hf-hub:`` loading resolves from:
        $VTX_HUB_CACHE/<org--repo>/. The result round-trips through
        ``create_model('hf-hub:org/repo', pretrained=True)``.

    Returns the destination (repo URL or local path).
    """
    import tempfile

    cfg = dict(pretrained_cfg or {})
    cfg.update(model_config or {})
    staging = tempfile.mkdtemp(prefix="vtx_hub_push_")
    save_local_dir(staging, architecture, params,
                   model_args=model_args, pretrained_cfg=cfg)
    with open(os.path.join(staging, "README.md"), "w") as f:
        f.write(generate_readme(model_card or {}, architecture))
    try:
        import huggingface_hub as hfh  # type: ignore
        tok = token or os.environ.get("HF_TOKEN")
        if tok:
            url = hfh.create_repo(repo_id, token=tok, private=private,
                                  exist_ok=True)
            hfh.upload_folder(repo_id=repo_id, folder_path=staging,
                              token=tok, commit_message=commit_message)
            return str(url)
    except ImportError:
        pass
    cache = os.environ.get("VTX_HUB_CACHE")
    if not cache:
        raise RuntimeError(
            "push_to_hf_hub: no huggingface_hub+token for a real push and "
            "no $VTX_HUB_CACHE for a local one. Set VTX_HUB_CACHE to a "
            "directory to publish into the local hub cache.")
    dest = os.path.join(cache, repo_id.replace("/", "--"))
    os.makedirs(dest, exist_ok=True)
    for fn in os.listdir(staging):
        os.replace(os.path.join(staging, fn), os.path.join(dest, fn))
    return dest


def resolve_pretrained_cfg(model_name: str,
                           pretrained_cfg: Optional[dict] = None,
                           pretrained_cfg_overlay: Optional[dict] = None,
                           ) -> dict:
    """Registry default cfg <- explicit cfg <- overlay (reference
    _builder.py resolve_pretrained_cfg semantics)."""
    from vision_transformers_torch_xla_tpu.models.registry import (
        get_default_cfg,
    )

    cfg = get_default_cfg(model_name)
    if pretrained_cfg:
        cfg.update(pretrained_cfg)
    if pretrained_cfg_overlay:
        cfg.update(pretrained_cfg_overlay)
    return cfg


# ---------------------------------------------------------------------------
# merging loaded weights into initialized params

def _infer_prefix_tokens(n_old: int, n_new: int) -> Optional[int]:
    """Shared prefix-token count p where both (n-p) are perfect squares."""
    for p in range(0, 9):
        a, b = n_old - p, n_new - p
        if a <= 0 or b <= 0:
            continue
        ra, rb = int(round(a ** 0.5)), int(round(b ** 0.5))
        if ra * ra == a and rb * rb == b:
            return p
    return None


def merge_into_params(params: Any, loaded: Dict[str, Any],
                      resample: bool = True) -> Tuple[Any, int]:
    """Merge a loaded (numpy) tree into an initialized params tree.

    Shape-matching leaves are replaced; a mismatched ``pos_embed`` is
    bicubic-resampled to the new grid (reference load_pretrained /
    resize_pos_embed vision_transformer.py:1066); anything else mismatched
    (e.g. the classifier head when num_classes differs — reference
    _builder.py load_pretrained drops classifier keys) is skipped with a
    warning. Returns (merged, n_loaded).
    """
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    params = nn.meta.unbox(params)  # strip Partitioned boxes if present
    if isinstance(loaded, dict) and "params" in loaded and \
            set(loaded) <= {"params", "batch_stats"}:
        # BN-family converters return flax collections; merge the params
        # here — callers that track model_state merge batch_stats themselves
        loaded = loaded["params"]
    flat_l = flatten_tree(loaded)
    n_loaded = 0

    def merge(path, leaf):
        nonlocal n_loaded
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        cand = flat_l.get(key)
        if cand is None:
            return leaf
        if tuple(cand.shape) == tuple(leaf.shape):
            n_loaded += 1
            return jnp.asarray(cand, leaf.dtype)
        if (resample and key.split("/")[-1] == "pos_embed"
                and cand.ndim == 3 and len(leaf.shape) == 3
                and cand.shape[-1] == leaf.shape[-1]):
            p = _infer_prefix_tokens(cand.shape[1], leaf.shape[1])
            if p is not None:
                from vision_transformers_torch_xla_tpu.models.vit import (
                    resample_pos_embed,
                )

                go = int(round((cand.shape[1] - p) ** 0.5))
                gn = int(round((leaf.shape[1] - p) ** 0.5))
                n_loaded += 1
                log.info("resampled %s %s -> %s", key, cand.shape, leaf.shape)
                return resample_pos_embed(
                    jnp.asarray(cand, leaf.dtype), (gn, gn), (go, go),
                    num_prefix_tokens=p).astype(leaf.dtype)
        log.warning("skip %s (shape %s vs %s)", key, cand.shape, leaf.shape)
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge, params)
    return merged, n_loaded


# ---------------------------------------------------------------------------
# module attachment (factory -> caller hand-off)

def attach_pretrained(module: Any, loaded: Dict[str, Any],
                      pretrained_cfg: Optional[dict] = None) -> None:
    # Flax modules freeze __setattr__ after construction; bypass via
    # object.__setattr__ (extra instance attrs are invisible to tracing)
    object.__setattr__(module, "_vtx_pretrained", (loaded, pretrained_cfg or {}))


def pretrained_state(module: Any):
    return getattr(module, "_vtx_pretrained", None)


def apply_pretrained(module: Any, params: Any) -> Any:
    """Merge create_model(pretrained=True)-loaded weights into params.

    No-op (returns params unchanged) when the module was created without a
    pretrained source.
    """
    state = pretrained_state(module)
    if state is None:
        return params
    loaded, _cfg = state
    merged, n = merge_into_params(params, loaded)
    log.info("applied %d pretrained params", n)
    if n == 0:
        raise ValueError(
            "pretrained checkpoint matched 0 parameters — wrong architecture "
            "or an unconverted state dict?")
    return merged
