"""Device mesh + distributed init.

TPU-native replacement for the reference's process-per-core model
(`torch_xla.launch`, reference main.py:1253) and torch.distributed `xla`
backend rendezvous (`init_process_group("xla", "xla://")`, reference
utils/__init__.py:57-61). JAX runs one process per host with all local
devices visible; collectives are expressed through shardings on a
`jax.sharding.Mesh` and lowered by XLA onto ICI/DCN automatically.

The mesh has two named axes by default:
  data  -- data parallelism (the reference's only strategy, SURVEY §2.3)
  model -- tensor parallelism over attention heads / MLP hidden dim (new)
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger(__name__)

# Logical-axis -> mesh-axis rules used by flax.linen logical partitioning.
# 'fsdp' params additionally shard their embed axis over 'data' (ZeRO-3 style);
# plain DP leaves params replicated.
LOGICAL_AXIS_RULES = (
    ("batch", "data"),
    ("heads", "model"),
    ("mlp", "model"),
    ("qkv_out", "model"),
    ("embed", None),
    ("seq", None),
    ("classes", None),
    ("patch", None),
    ("layers", None),   # scan_blocks stacked-layer axis: never sharded
    ("seq_act", None),  # ACTIVATION token axis (params' 'seq' never shards)
)

FSDP_AXIS_RULES = LOGICAL_AXIS_RULES[:4] + (
    ("embed", "data"),
) + LOGICAL_AXIS_RULES[5:]

# Sequence parallelism: activations' token axis shards over 'model'
# (params replicated on that axis; GSPMD inserts the all-gathers attention
# needs). Useful for very long token counts; see docs/PARALLELISM.md.
SP_AXIS_RULES = tuple(
    (l, "model" if l == "seq_act" else (None if p == "model" else p))
    for l, p in LOGICAL_AXIS_RULES)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.

    Mirrors the defensive behavior of reference utils/__init__.py:26-97:
    auto-detects the environment, falls back silently to single-process when
    no cluster env is present instead of failing the run.
    """
    if jax.process_count() > 1:
        return  # already initialized
    # JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID are what
    # launch/runner.py exports on pod workers; COORDINATOR_ADDRESS /
    # MEGASCALE_* cover jax.distributed's own auto-detection names.
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    env_says_multihost = any(
        k in os.environ for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ) or coordinator_address is not None
    if not env_says_multihost:
        log.info("single-process mode (no coordinator env found)")
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    except Exception as e:  # pragma: no cover - defensive, parity with ref :82-96
        log.warning("distributed init failed (%s); continuing single-process", e)


def create_mesh(axes: Sequence[Tuple[str, int]] = (("data", -1),),
                devices: Optional[List[jax.Device]] = None,
                platform: Optional[str] = None) -> Mesh:
    """Build a Mesh from (name, size) pairs; one size may be -1 (inferred).

    On real hardware, prefer `jax.experimental.mesh_utils` device ordering so
    the 'data' axis rides ICI within a slice. Pass platform='cpu' to build a
    host-simulated mesh (tests use XLA_FLAGS=--xla_force_host_platform_device_count=N).
    """
    devices = list(devices if devices is not None else jax.devices(platform))
    n = len(devices)
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1])) if any(s != -1 for s in sizes) else 1
    if -1 in sizes:
        if n % known:
            raise ValueError(f"{n} devices not divisible by fixed axes {known}")
        sizes[sizes.index(-1)] = n // known
    want = int(np.prod(sizes))
    if want < n:
        devices = devices[:want]  # explicit smaller mesh: use a device subset
        n = want
    if want != n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {n} devices")
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(sizes, devices=devices)
    except Exception:
        dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(names))


def axis_rules(param_sharding: str = "replicated", mesh: Optional[Mesh] = None):
    """Logical->mesh rules, dropping mappings to axes absent from the mesh
    (e.g. a pure-DP 'data' mesh has no 'model' axis: TP rules fall back to
    replication)."""
    rules = {"fsdp": FSDP_AXIS_RULES, "sp": SP_AXIS_RULES}.get(
        param_sharding, LOGICAL_AXIS_RULES)
    if mesh is None:
        return rules
    return tuple((logical, phys if phys in mesh.axis_names else None)
                 for logical, phys in rules)
