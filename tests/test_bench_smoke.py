"""Smoke-test the driver bench entry point (bench.py).

Runs bench.py in VTX_BENCH_CPU_SMOKE mode (tiny model, CPU backend) in a
subprocess and asserts it prints exactly one well-formed JSON line with the
contract fields the driver records. This covers the whole bench code path —
model build, donation-safe state re-init, the MLP-variant autotune, and the
JSON report — without needing the real chip.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cpu_smoke():
    env = dict(os.environ, VTX_BENCH_CPU_SMOKE="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=500, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, rec
    assert rec["value"] > 0
    assert rec["mlp_variant"] in ("xla", "pallas")
