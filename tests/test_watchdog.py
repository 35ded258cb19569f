"""Watchdog tests (obs/watchdog.py)."""
import time

from vision_transformers_torch_xla_tpu.obs.watchdog import StepWatchdog


def test_watchdog_fires_on_stall():
    stalls = []
    wd = StepWatchdog(timeout_s=0.3,
                      on_stall=lambda age, steps: stalls.append((age, steps)))
    wd.start()
    wd.beat()
    time.sleep(1.0)
    wd.stop()
    assert stalls and stalls[0][1] == 1


def test_watchdog_quiet_with_beats():
    stalls = []
    wd = StepWatchdog(timeout_s=0.8,
                      on_stall=lambda *a: stalls.append(a))
    wd.start()
    for _ in range(6):
        wd.beat()
        time.sleep(0.1)
    wd.stop()
    assert not stalls
