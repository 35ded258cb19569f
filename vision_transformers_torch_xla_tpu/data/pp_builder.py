"""Preprocessing-op registry + string-spec DSL.

Semantics parity with the reference's big_vision pp builder
(reference big_vision/pp/builder.py:23-114): pipelines are strings like

    "decode_jpeg_and_inception_crop(224)|flip_lr|value_range(0, 1)|keep(\"image\", \"label\")"

split on '|', each op parsed as name(args) with `ast.literal_eval` for the
argument tuple/kwargs, resolved through a decorator registry, and composed
left-to-right over a feature dict. Ops are registered as *factories*: calling
`op(*args, **kw)` returns the actual `features -> features` function.
"""
from __future__ import annotations

import ast
from typing import Callable, Dict, List

_pp_ops: Dict[str, Callable] = {}


def register_pp_op(name: str = None):
    """Decorator: @register_pp_op() registers the factory under fn.__name__
    (with a leading 'get_' stripped, parity with big_vision naming)."""

    def _register(factory: Callable) -> Callable:
        key = name or factory.__name__
        if key.startswith("get_"):
            key = key[4:]
        _pp_ops[key] = factory
        return factory

    return _register


def list_pp_ops() -> List[str]:
    from vision_transformers_torch_xla_tpu.data import pp_ops  # noqa: F401 (registers)

    return sorted(_pp_ops)


def _parse_call(spec: str):
    """'op(1, key="v")' -> (name, args, kwargs); bare 'op' -> (op, (), {}).

    Mirrors big_vision/pp/builder.py:58-94 (ast-based, no eval of code).
    """
    spec = spec.strip()
    if not spec:
        raise ValueError("empty pp op spec")
    if "(" not in spec:
        return spec, (), {}
    expr = ast.parse(spec, mode="eval").body
    if not isinstance(expr, ast.Call) or not isinstance(expr.func, ast.Name):
        raise ValueError(f"malformed pp op spec: {spec!r}")
    args = tuple(ast.literal_eval(a) for a in expr.args)
    kwargs = {kw.arg: ast.literal_eval(kw.value) for kw in expr.keywords}
    return expr.func.id, args, kwargs


def get_preprocess_fn(pp_spec: str, log_name: str = "") -> Callable:
    """Compose a pp string into one features->features function.

    Parity: reference big_vision/pp/builder.py:97-114.
    """
    # import op modules lazily so registration happens on first use
    from vision_transformers_torch_xla_tpu.data import pp_ops  # noqa: F401

    fns = []
    for part in pp_spec.split("|"):
        part = part.strip()
        if not part:
            continue
        op_name, args, kwargs = _parse_call(part)
        if op_name not in _pp_ops:
            raise ValueError(
                f"unknown pp op {op_name!r} in {pp_spec!r}; known: {list_pp_ops()}")
        fns.append(_pp_ops[op_name](*args, **kwargs))

    def _fn(features):
        for fn in fns:
            features = fn(features)
        return features

    _fn.__name__ = f"pp({log_name or pp_spec})"
    return _fn
