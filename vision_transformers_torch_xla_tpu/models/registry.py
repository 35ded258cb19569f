"""Model registry.

API parity with the reference's timm-fork registry
(reference models/_registry.py: `register_model` :78, `list_models` /
`is_model` / `model_entrypoint` :18-32, `split_model_name_tag`): a flat
name -> entrypoint map with optional `name.tag` pretrained tags, fnmatch
filtering, and deprecation aliases.
"""
from __future__ import annotations

import fnmatch
import sys
import warnings
from typing import Callable, Dict, List, Optional

_model_entrypoints: Dict[str, Callable] = {}
_model_default_cfgs: Dict[str, dict] = {}
_deprecated_models: Dict[str, str] = {}


def split_model_name_tag(model_name: str, no_tag: str = ""):
    """'name.tag' -> ('name', 'tag'). Parity: models/_registry.py:32."""
    name, *tag = model_name.split(".", 1)
    return name, (tag[0] if tag else no_tag)


def register_model(fn: Callable = None, *, default_cfg: Optional[dict] = None):
    """Decorator registering a model entrypoint under its function name."""

    def _register(fn: Callable) -> Callable:
        name = fn.__name__
        if name in _model_entrypoints:
            warnings.warn(f"model {name!r} re-registered; overwriting")
        _model_entrypoints[name] = fn
        if default_cfg is not None:
            _model_default_cfgs[name] = default_cfg
        mod = sys.modules.get(fn.__module__)
        if mod is not None and hasattr(mod, "__all__") and name not in mod.__all__:
            mod.__all__.append(name)
        return fn

    return _register(fn) if fn is not None else _register


def register_deprecation(old_name: str, new_name: str) -> None:
    _deprecated_models[old_name] = new_name


def list_models(filter: str = "", exclude_filters: str = "") -> List[str]:
    names = sorted(_model_entrypoints)
    if filter:
        names = [n for n in names if fnmatch.fnmatch(n, filter)]
    if exclude_filters:
        names = [n for n in names if not fnmatch.fnmatch(n, exclude_filters)]
    return names


def is_model(name: str) -> bool:
    name = split_model_name_tag(name)[0]
    return name in _model_entrypoints or name in _deprecated_models


def model_entrypoint(name: str) -> Callable:
    name = split_model_name_tag(name)[0]
    if name in _deprecated_models:
        new = _deprecated_models[name]
        warnings.warn(f"model {name!r} is deprecated; use {new!r}", stacklevel=2)
        # deprecation targets may carry a pretrained tag (reference
        # register_model_deprecations data, e.g. 'inception_v3.tf_adv_in1k')
        name = split_model_name_tag(new)[0]
    try:
        return _model_entrypoints[name]
    except KeyError:
        raise RuntimeError(f"unknown model {name!r}; known: {list_models()[:20]}...")


_pretrained_tag_cfgs: Dict[str, Dict[str, dict]] = {}


def load_pretrained_cfg_db(path: str) -> None:
    """Load the extracted pretrained-cfg/deprecation database (see
    tools/gen_pretrained_cfgs.py; data mirrors the reference's
    generate_default_cfgs tables + register_model_deprecations calls)."""
    import json

    with open(path) as f:
        db = json.load(f)
    for name, tags in db.get("cfgs", {}).items():
        _pretrained_tag_cfgs.setdefault(name, {}).update(tags)
    for old, new in db.get("deprecations", {}).items():
        _deprecated_models.setdefault(old, new)


def list_pretrained_tags(name: str) -> List[str]:
    name = split_model_name_tag(name)[0]
    return sorted(t for t in _pretrained_tag_cfgs.get(name, {}) if t)


def get_default_cfg(name: str) -> dict:
    """Resolved default/pretrained cfg for 'name' or 'name.tag'.

    Priority: tag-specific cfg from the reference's generate_default_cfgs
    data (input size, crop, mean/std, classifier, ...), then the first
    tag's cfg when no tag is given, then any cfg attached at
    register_model time.
    """
    base, tag = split_model_name_tag(name)
    out = dict(_model_default_cfgs.get(base, {}))
    tags = _pretrained_tag_cfgs.get(base, {})
    if tags:
        if tag and tag in tags:
            out.update(tags[tag])
        elif not tag:
            # first registered tag is the default (reference DefaultCfg)
            first = next(iter(tags.values()))
            out.update(first)
        elif tag:
            raise RuntimeError(
                f"unknown pretrained tag {tag!r} for {base!r}; known: "
                f"{list_pretrained_tags(base)}")
    return out
