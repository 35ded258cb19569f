"""Generate tests/golden_shapes.json: per-stage feature-tap shapes for
every registered model name, derived with jax.eval_shape (zero compiles).

VERDICT r3 task 4a: param-count parity can't catch stride placement, pool
position, or norm-site bugs — per-stage output shapes can. Entry format:

    name -> [hw, [[tap shapes...], ...], [logits shape]]

Trunks without stage/block taps record an empty tap list (their logits
shape is still pinned). Run on CPU; shapes are backend-independent.

    JAX_PLATFORMS=cpu python tools/gen_golden_shapes.py [--resume]
"""
from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vision_transformers_torch_xla_tpu.models import factory, registry  # noqa: E402
from vision_transformers_torch_xla_tpu.models.features import (  # noqa: E402
    _run_with_taps,
)

HERE = os.path.dirname(__file__)
PARAMS = os.path.join(HERE, "..", "tests", "golden_params.json")
OUT = os.path.join(HERE, "..", "tests", "golden_shapes.json")
TMP = OUT + ".jsonl"          # progressive output, resumable


def shapes_for(name: str, hw: int):
    m = factory.create_model(name)
    x = jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32)
    vs = jax.eval_shape(lambda xx: m.init(
        {"params": jax.random.key(0), "droppath": jax.random.key(1)},
        xx, True), x)
    try:
        y, taps = jax.eval_shape(
            lambda v, xx: _run_with_taps(m, v, xx, True), vs, x)
        tap_shapes = [list(t.shape) for t in taps]
    except ValueError:           # no taps sown in this trunk
        y = jax.eval_shape(lambda v, xx: m.apply(v, xx, True), vs, x)
        tap_shapes = []
    return [hw, tap_shapes, list(y.shape)]


def main():
    golden = json.load(open(PARAMS))
    done = {}
    if "--resume" in sys.argv and os.path.exists(TMP):
        with open(TMP) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["name"]] = rec["entry"]
    names = sorted(registry.list_models())
    with open(TMP, "a") as out:
        for i, name in enumerate(names):
            if name in done:
                continue
            hw = golden.get(name, [224])[0]
            try:
                entry = shapes_for(name, hw)
            except Exception as e:  # record failures for triage
                entry = [hw, None, None]
                print(f"FAIL {name}: {e}", file=sys.stderr)
            done[name] = entry
            out.write(json.dumps({"name": name, "entry": entry}) + "\n")
            out.flush()
            if i % 25 == 0:
                print(f"{i}/{len(names)} {name}", flush=True)
    with open(OUT, "w") as f:
        json.dump({n: done[n] for n in sorted(done)}, f)
    print(f"wrote {len(done)} entries to {OUT}")


if __name__ == "__main__":
    main()
