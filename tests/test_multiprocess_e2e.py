"""Real 2-process jax.distributed test, run as a subprocess from pytest.

(The heavy lifting is tools/test_multiprocess.py; see its docstring.)
"""
import os
import subprocess
import sys

import pytest


def test_two_process_distributed():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "test_multiprocess.py")],
        capture_output=True, text=True, timeout=460, cwd=root)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
    assert "MULTIPROCESS: PASS" in r.stdout
