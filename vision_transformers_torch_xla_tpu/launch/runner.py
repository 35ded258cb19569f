"""Multihost TPU-pod runner: fan out a command to every worker VM.

Feature parity with the reference's MaxText-derived runner
(reference multihost_runner_orig.py: slice discovery via gcloud :104-148,
workdir tar+scp :200-235, stale TPU process cleanup :177-198, per-worker env
injection :257-270, parallel ssh with fail-fast + per-worker logs :296-394)
— re-designed for JAX's process-per-host model: instead of exporting
WORLD_SIZE/RANK/LOCAL_RANK and appending --world-size/--rank flags, workers
get the JAX coordinator env (JAX on TPU VMs discovers topology from the
metadata server; only the coordinator address needs injecting for
multi-slice DCN setups).

This is an operational tool: it shells out to `gcloud`, so it is exercised
on real pods, not in CI (same stance as the reference).
"""
from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import tarfile
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import List, Optional


@dataclass
class Worker:
    tpu_name: str
    slice_idx: int
    worker_idx: int
    global_idx: int


def sh(cmd: List[str], **kw) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def discover_slices(tpu_prefix: str, project: str, zone: str) -> List[dict]:
    """List TPU VMs whose name starts with the prefix (reference :104-148)."""
    r = sh(["gcloud", "alpha", "compute", "tpus", "tpu-vm", "list",
            f"--project={project}", f"--zone={zone}", "--format=json"])
    if r.returncode != 0:
        raise RuntimeError(f"gcloud list failed: {r.stderr}")
    out = []
    for tpu in json.loads(r.stdout or "[]"):
        name = tpu["name"].split("/")[-1]
        if name.startswith(tpu_prefix):
            out.append({"name": name,
                        "workers": len(tpu.get("networkEndpoints", [1]))})
    if not out:
        raise RuntimeError(f"no TPUs matching prefix {tpu_prefix!r}")
    return out


def enumerate_workers(slices: List[dict]) -> List[Worker]:
    workers, g = [], 0
    for si, sl in enumerate(slices):
        for wi in range(sl["workers"]):
            workers.append(Worker(sl["name"], si, wi, g))
            g += 1
    return workers


def tar_workdir(workdir: str) -> str:
    """Tar the working dir for scp (reference :200-215)."""
    fd, path = tempfile.mkstemp(suffix=".tar.gz")
    os.close(fd)
    with tarfile.open(path, "w:gz") as tar:
        for entry in os.listdir(workdir):
            if entry in (".git", "__pycache__", ".jax_cache", "output"):
                continue
            tar.add(os.path.join(workdir, entry), arcname=entry)
    return path


STALE_CLEANUP = (
    "sudo lsof -t /dev/accel* 2>/dev/null | xargs -r sudo kill -9; "
    "sudo rm -f /tmp/libtpu_lockfile; "
)


def run_on_worker(w: Worker, args, tarball: Optional[str],
                  coordinator: str, num_processes: int,
                  log_dir: str) -> int:
    """scp code + run command on one worker over gcloud ssh
    (reference :237-294)."""
    base = ["gcloud", "alpha", "compute", "tpus", "tpu-vm"]
    tgt = f"--worker={w.worker_idx}"
    proj = f"--project={args.PROJECT}"
    zone = f"--zone={args.ZONE}"
    logfile = os.path.join(log_dir, f"worker_{w.global_idx}.log")

    if tarball:
        r = sh(base + ["scp", tarball, f"{w.tpu_name}:~/code.tar.gz",
                       tgt, proj, zone], timeout=600)
        if r.returncode != 0:
            sys.stderr.write(f"[w{w.global_idx}] scp failed: {r.stderr}\n")
            return r.returncode

    env = (f"export JAX_COORDINATOR_ADDRESS={coordinator} "
           f"JAX_NUM_PROCESSES={num_processes} "
           f"JAX_PROCESS_ID={w.global_idx} TPU_LOG_DIR=~/tpu_logs && ")
    setup = ("mkdir -p ~/run && cd ~/run && "
             + ("tar xzf ~/code.tar.gz && " if tarball else "")
             + STALE_CLEANUP)
    cmd = setup + env + args.COMMAND
    with open(logfile, "w") as lf:
        p = subprocess.Popen(
            base + ["ssh", w.tpu_name, tgt, proj, zone,
                    f"--command={cmd}"],
            stdout=lf, stderr=subprocess.STDOUT)
        return p.wait()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("multihost runner")
    ap.add_argument("--TPU_PREFIX", required=True)
    ap.add_argument("--PROJECT", required=True)
    ap.add_argument("--ZONE", required=True)
    ap.add_argument("--COMMAND", required=True)
    ap.add_argument("--SCP_CODE", type=lambda s: s.lower() != "false", default=True)
    ap.add_argument("--LOG_DIR", default="./runner_logs")
    args = ap.parse_args(argv)

    slices = discover_slices(args.TPU_PREFIX, args.PROJECT, args.ZONE)
    workers = enumerate_workers(slices)
    print(f"{len(slices)} slice(s), {len(workers)} worker(s)")
    os.makedirs(args.LOG_DIR, exist_ok=True)

    tarball = tar_workdir(os.getcwd()) if args.SCP_CODE else None
    coordinator = f"{workers[0].tpu_name}:8476"

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=len(workers)) as pool:
        futures = {pool.submit(run_on_worker, w, args, tarball, coordinator,
                               len(workers), args.LOG_DIR): w for w in workers}
        rc = 0
        for fut, w in futures.items():
            code = fut.result()
            if code != 0:
                print(f"worker {w.global_idx} FAILED (rc={code}); "
                      f"see {args.LOG_DIR}/worker_{w.global_idx}.log")
                rc = rc or code
                # fail-fast: cancel the rest (reference :350-354)
                for other in futures:
                    other.cancel()
    print(f"done in {time.time() - t0:.0f}s (rc={rc})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
