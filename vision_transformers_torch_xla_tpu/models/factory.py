"""Model factory.

API parity with the reference's `create_model`
(reference models/_factory.py:46-155): resolve a registered entrypoint by
name and build the model with keyword overrides. The reference returns a
stateful nn.Module; here the entrypoint returns an *uninitialized* Flax
module (params are created explicitly with `model.init` by the caller,
keeping the train step purely functional).
"""
from __future__ import annotations

from typing import Any

from vision_transformers_torch_xla_tpu.models.registry import (
    model_entrypoint,
    split_model_name_tag,
)


def parse_model_name(model_name: str):
    """Split source prefix: 'hf-hub:org/repo' / 'local-dir:/path' / plain.

    Parity with reference models/_factory.py:20-43.
    """
    for prefix in ("hf-hub", "local-dir"):
        if model_name.startswith(prefix + ":"):
            return prefix, model_name[len(prefix) + 1:]
    return "", model_name


def create_model(model_name: str, pretrained: bool = False,
                 pretrained_cfg: Any = None,
                 pretrained_cfg_overlay: Any = None,
                 features_only: bool = False,
                 out_indices: Any = None, **kwargs: Any):
    """Build a model module by registry name.

    kwargs whose value is None are dropped (parity with
    models/_factory.py:143-146 kwargs filtering).

    Pretrained sources (reference _builder.py:551 load_pretrained /
    _factory.py:20-43 prefixes, resolved locally — zero egress):
      * ``pretrained=True`` — loads the file named by the resolved
        pretrained cfg (registry default cfg updated by ``pretrained_cfg``
        and ``pretrained_cfg_overlay``; pass ``dict(file=...)`` to point at
        a checkpoint on disk).
      * ``'local-dir:<path>'`` — config.json + weights from a directory.
      * ``'hf-hub:org/repo'`` — resolved through a local HF-style cache.

    The loaded state dict is attached to the returned module; merge it into
    initialized params with ``models.pretrained.apply_pretrained``.
    """
    from vision_transformers_torch_xla_tpu.models import pretrained as P

    source, model_name = parse_model_name(model_name)
    dir_args: dict = {}
    if source in ("hf-hub", "local-dir"):
        resolver = P.resolve_hf_hub if source == "hf-hub" else P.load_local_dir
        model_name, dir_args, dir_cfg = resolver(model_name)
        pretrained_cfg = {**dir_cfg, **(pretrained_cfg or {})}
        pretrained = True
    name, tag = split_model_name_tag(model_name)
    kwargs = {**dir_args, **{k: v for k, v in kwargs.items() if v is not None}}
    entrypoint = model_entrypoint(name)
    if tag:
        kwargs.setdefault("pretrained_tag", tag)
    module = entrypoint(**kwargs)
    if pretrained:
        cfg = P.resolve_pretrained_cfg(model_name, pretrained_cfg,
                                       pretrained_cfg_overlay)
        path = cfg.get("file") or cfg.get("checkpoint_path")
        if not path:
            raise FileNotFoundError(
                f"pretrained=True for {model_name!r} but no local weights "
                f"file is configured (no network egress here). Pass "
                f"pretrained_cfg_overlay=dict(file='<path>') or use "
                f"'local-dir:<dir>'.")
        loaded = P.load_state_dict(str(path), model_name=name)
        P.attach_pretrained(module, loaded, cfg)
    if features_only:
        # reference _factory.py features_only path (via _builder.py's
        # FeatureListNet wrap): return the functional wrapper whose apply
        # yields the selected feature-pyramid list instead of logits.
        # Wrapped after the pretrained attach so loaded weights ride the
        # inner trunk, exactly where apply_pretrained expects them.
        from vision_transformers_torch_xla_tpu.models.features import (
            FeatureListNet,
        )
        module = FeatureListNet(module, out_indices=out_indices)
    return module
