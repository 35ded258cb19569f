"""Microbench the head-pair attention kernels in isolation (fwd+stats, bwd).

Times each pallas_call directly (ViT-B regime: B=128, S=197, H=12, D=64)
so sub-0.1-ms kernel changes are visible above whole-step harness noise.

Run:  python tools/bench_attn_kernel.py [iters]
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.ops import flash_attention as fa


def timeit(fn, argsets, iters=50, warmup=5):
    """argsets: list of distinct arg tuples, cycled — identical dispatches
    can be short-circuited by the remote backend, so vary the inputs."""
    n = len(argsets)
    for i in range(warmup):
        out = fn(*argsets[i % n])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*argsets[i % n])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    b, s, h, d = 128, 197, 12, 64
    scale = d ** -0.5
    rng = np.random.default_rng(0)
    nv = 8  # distinct input variants, cycled
    qkvs = [jnp.asarray(rng.normal(size=(b, s, 3 * h * d)) * 0.5,
                        jnp.bfloat16) for _ in range(nv)]
    dos = [jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.bfloat16)
           for _ in range(nv)]

    fwd = jax.jit(lambda x: fa._hp_fwd_stats_call(x, scale, s, h, d))
    fwd_sets = [(q,) for q in qkvs]
    t_fwd = timeit(fwd, fwd_sets, iters=iters)

    bwd = jax.jit(lambda x, g, oo, ss: fa._hp_bwd_pi_call(
        x, g, oo, ss, scale, s, h, d))
    bwd_sets = []
    for q, g in zip(qkvs, dos):
        o, st = fwd(q)
        bwd_sets.append((q, g, o, st))
    t_bwd = timeit(bwd, bwd_sets, iters=iters)

    # 12 blocks/step in ViT-B
    print(f"fwd+stats: {t_fwd * 1e3:.3f} ms/call ({12 * t_fwd * 1e3:.2f} ms/step)")
    print(f"bwd(pi):   {t_bwd * 1e3:.3f} ms/call ({12 * t_bwd * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
