"""Persistent XLA compile cache.

Compilation through this image's remote-compile path costs minutes per big
graph; the on-disk cache makes reruns of identical configs near-instant.
Used by the trainer, bench.py, and the graft entry points.
"""
from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger(__name__)
_DEFAULT_DIR = os.environ.get("JAX_COMPILE_CACHE_DIR",
                              os.path.expanduser("~/.cache/vtx_jax"))


def enable_persistent_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        log.warning("compile cache unavailable: %s", e)
