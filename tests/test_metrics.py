"""Meter tests (obs/metrics.py — reference utils/__init__.py:103-275 parity)."""
from vision_transformers_torch_xla_tpu.obs.metrics import MetricLogger, SmoothedValue


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0          # window holds [2,3,4]
    assert v.avg == 3.0
    assert v.global_avg == 2.5      # all four
    assert v.max == 4.0


def test_smoothed_value_weighted_counts():
    v = SmoothedValue()
    v.update(1.0, n=3)
    v.update(5.0, n=1)
    assert v.count == 4
    assert v.global_avg == (3 * 1.0 + 5.0) / 4


def test_metric_logger_update_and_str():
    m = MetricLogger()
    m.update(loss=2.0, acc=0.5)
    m.update(loss=1.0)
    assert m.meters["loss"].global_avg == 1.5
    s = str(m)
    assert "loss" in s and "acc" in s


def test_log_every_iterates_fully():
    printed = []
    m = MetricLogger(print_fn=printed.append)
    out = list(m.log_every(range(7), print_freq=2, header="t", total=7))
    assert out == list(range(7))
    assert any("[0/7]" in p for p in printed)
    assert any("done" in p for p in printed)


def test_single_process_sync_noop():
    v = SmoothedValue()
    v.update(2.0)
    v.synchronize_between_processes()  # single process: unchanged
    assert v.global_avg == 2.0
