"""Sharding helpers: turning flax logical-axis metadata into NamedShardings.

The reference never shards anything (params replicated, grads all-reduced by
`xm.optimizer_step`, reference engine.py:185). Here shardings are explicit:
the batch is sharded over the 'data' mesh axis, params carry logical axis
names resolved through `parallel.mesh.axis_rules`, and XLA's GSPMD
partitioner inserts all collectives (the psum the reference spelled as a
gradient all-reduce falls out of jit automatically).
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def params_sharding(mesh: Mesh, abstract_params: Any, rules) -> Any:
    """Resolve flax Partitioned metadata -> NamedSharding tree.

    `abstract_params` is the output of `jax.eval_shape(model.init, ...)` with
    `nn.with_logical_partitioning`-annotated params.
    """
    logical_specs = nn.get_partition_spec(abstract_params)
    return nn.logical_to_mesh_sharding(logical_specs, mesh, rules)


def unbox(tree: Any) -> Any:
    """Strip flax Partitioned boxes -> plain arrays (for pure-functional steps)."""
    return nn.meta.unbox(tree)
