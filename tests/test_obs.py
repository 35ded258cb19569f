"""Event logger + profiler helper tests (C15/C16 aux coverage)."""
import os
import time

from vision_transformers_torch_xla_tpu.obs.loggers import EventLogger, JsonlLogger
from vision_transformers_torch_xla_tpu.obs.profiler import StepTimer


def test_event_logger_writes_tagged_file(tmp_path):
    ev = EventLogger("dataset", log_dir=str(tmp_path))
    ev.log("built train split")
    ev.log("built val split")
    lines = open(tmp_path / "dataset.log").readlines()
    assert len(lines) == 2
    assert "[dataset]" in lines[0] and "train split" in lines[0]


def test_jsonl_logger(tmp_path):
    import json

    jl = JsonlLogger(str(tmp_path))
    jl.log({"epoch": 0, "acc": 1.0})
    jl.log({"epoch": 1, "acc": 2.0})
    recs = [json.loads(l) for l in open(tmp_path / "log.txt")]
    assert [r["epoch"] for r in recs] == [0, 1]


def test_step_timer_percentiles():
    t = StepTimer()
    for _ in range(5):
        t.start()
        time.sleep(0.01)
        t.stop()
    s = t.summary()
    assert s["n"] == 5
    assert 0.005 < s["p50_s"] < 0.1
