"""Reference-bug compatibility audit tests (docs/REFERENCE_BUGS.md).

Each test pins a behavior the reference gets wrong (SURVEY §7 'known
reference bugs to NOT replicate') to its correct counterpart here.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_torch_xla_tpu.core.config import TrainConfig
from vision_transformers_torch_xla_tpu.launch import main as trainer


def _cfg(tmp_path, **kw):
    base = dict(
        model="vit_tiny_patch16_224", input_size=32, nb_classes=10,
        data_set="synthetic", batch_size=8, epochs=1,
        limit_steps_per_epoch=2, limit_eval_batches=2,
        warmup_epochs=0, lr=1e-3, device="cpu", mesh_shape="data:1",
        output_dir=str(tmp_path), save_ckpt=False, log_freq=1,
        synthetic_train_size=64, synthetic_val_size=64)
    base.update(kw)
    return TrainConfig(**base)


def test_precision_policy_single_path():
    """Reference bug #1: dead duplicated AMP branch (engine.py:245-255).
    Here precision is one explicit dtype policy, no branch to go dead."""
    from vision_transformers_torch_xla_tpu.core.dtypes import get_policy

    bf16 = get_policy("bf16")
    assert bf16.compute_dtype == jnp.bfloat16
    assert bf16.param_dtype == jnp.float32
    fp32 = get_policy("fp32")
    assert fp32.compute_dtype == jnp.float32


def test_ema_and_kd_together(tmp_path):
    """Reference bug #2: --model_ema --kd crashes on an undefined name
    (main.py:748 vs :868). Here it is just two flags."""
    stats = trainer.main(_cfg(
        tmp_path, model_ema=True, model_ema_eval=True, kd=True,
        teacher_model="vit_tiny_patch16_224"))
    assert np.isfinite(stats["train_loss"])
    assert "ema_acc1" in stats  # EMA weights evaluated too


def test_eval_device_accumulation(tmp_path):
    """Reference bug #6: per-batch host syncs in eval (engine.py:403 /
    round-1's float(m[k]) loop). Eval accumulates on device and pulls to
    host once at the end regardless of batch count."""
    import vision_transformers_torch_xla_tpu.launch.main as m

    cfg = _cfg(tmp_path, limit_eval_batches=4)
    ctx = m.setup(cfg)
    result = m.evaluate(ctx, max_batches=4)
    assert result["count"] == 4 * cfg.eval_batch_size()
    # structural check: device-side jitted accumulation, one final host pull
    import inspect

    src = inspect.getsource(m.evaluate)
    assert "accum(totals, m)" in src
    assert "+= float" not in src  # the round-1 per-batch sync is gone
