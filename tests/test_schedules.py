"""Schedule parity tests against the reference semantics
(reference utils/__init__.py:667-684)."""
import numpy as np

from vision_transformers_torch_xla_tpu.train.schedules import (
    cosine_schedule_fn,
    cosine_scheduler,
)


def _reference_cosine(base, final, epochs, niter, warmup_epochs=0,
                      start_warmup=0.0, warmup_steps=-1):
    """Independent numpy re-derivation of the reference formula."""
    warmup_iters = warmup_steps if warmup_steps > 0 else warmup_epochs * niter
    sched = []
    total = epochs * niter
    rest = total - warmup_iters
    for i in range(total):
        if i < warmup_iters:
            sched.append(start_warmup + i * (base - start_warmup) / warmup_iters)
        else:
            j = i - warmup_iters
            sched.append(final + 0.5 * (base - final) * (1 + np.cos(np.pi * j / rest)))
    return np.asarray(sched)


def test_array_matches_formula():
    got = cosine_scheduler(4e-3, 1e-6, epochs=10, niter_per_ep=50,
                           warmup_epochs=2, start_warmup_value=1e-6)
    want = _reference_cosine(4e-3, 1e-6, 10, 50, 2, 1e-6)
    assert got.shape == (500,)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fn_matches_array():
    arr = cosine_scheduler(1e-3, 1e-5, epochs=4, niter_per_ep=25, warmup_epochs=1)
    fn = cosine_schedule_fn(1e-3, 1e-5, epochs=4, niter_per_ep=25, warmup_epochs=1)
    for step in [0, 1, 24, 25, 26, 50, 99]:
        np.testing.assert_allclose(float(fn(step)), arr[step], rtol=1e-5)


def test_warmup_endpoints():
    fn = cosine_schedule_fn(1.0, 0.0, epochs=2, niter_per_ep=100, warmup_epochs=1)
    assert float(fn(0)) == 0.0            # start of warmup
    assert abs(float(fn(100)) - 1.0) < 1e-6   # warmup hits base value
    assert float(fn(199)) < 0.01          # near-final at the end


def test_warmup_steps_override():
    """warmup_steps > 0 overrides warmup_epochs (ref :672)."""
    a = cosine_scheduler(1.0, 0.0, 2, 100, warmup_epochs=1, warmup_steps=10)
    assert abs(a[10] - 1.0) < 0.05 and a[0] == 0.0
