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


def create_model(model_name: str, pretrained: bool = False, **kwargs: Any):
    """Build a model module by registry name.

    kwargs whose value is None are dropped (parity with
    models/_factory.py:143-146 kwargs filtering).
    """
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
