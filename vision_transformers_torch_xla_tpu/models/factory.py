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


def create_model(model_name: str, pretrained: bool = False, **kwargs: Any):
    """Build a model module by registry name.

    kwargs whose value is None are dropped (parity with
    models/_factory.py:143-146 kwargs filtering).
    """
    source, model_name = parse_model_name(model_name)
    if source == "hf-hub":
        raise NotImplementedError(
            "hf-hub model loading needs network access; download the "
            "checkpoint and use --finetune/local-dir instead")
    if source == "local-dir":
        raise NotImplementedError(
            "local-dir configs land with the hub converter; pass the "
            "registry name plus --finetune <ckpt> for now")
    name, tag = split_model_name_tag(model_name)
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    entrypoint = model_entrypoint(name)
    if tag:
        kwargs.setdefault("pretrained_tag", tag)
    if pretrained:
        raise NotImplementedError(
            "pretrained weight loading lands with the checkpoint converter; "
            "use ckpt.load_reference_checkpoint for torch checkpoints")
    return entrypoint(**kwargs)
