"""End-to-end CLI trainer tests (in-process, CPU, tiny shapes).

The rebuild's equivalent of the reference's 'short CPU/XLA passes as
compile-warmup regression checks' (reference AGENTS.md regimen, SURVEY §4.4):
full main() with train + eval + checkpoint + resume on synthetic data.
"""
import json
import os

import pytest

from vision_transformers_torch_xla_tpu.core.config import TrainConfig
from vision_transformers_torch_xla_tpu.launch import main as trainer


def _cfg(tmp_path, **kw):
    base = dict(
        model="vit_tiny_patch16_224", input_size=32, nb_classes=10,
        data_set="synthetic", batch_size=8, epochs=1,
        limit_steps_per_epoch=2, limit_eval_batches=1,
        warmup_epochs=0, lr=1e-3, device="cpu", mesh_shape="data:1",
        output_dir=str(tmp_path), save_ckpt=True, log_freq=1,
        synthetic_train_size=64, synthetic_val_size=32, model_ema=True)
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def tiny_override(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


def test_cli_train_eval_ckpt_log(tmp_path):
    # vit_tiny at 32px: small enough for the CPU test host
    stats = trainer.main(_cfg(tmp_path))
    assert "acc1" in stats and "train_loss" in stats
    log_path = os.path.join(tmp_path, "log.txt")
    assert os.path.exists(log_path)
    rec = json.loads(open(log_path).readline())
    assert rec["epoch"] == 0
    assert os.path.isdir(os.path.join(tmp_path, "checkpoints", "0"))


def test_cli_resume_continues(tmp_path):
    trainer.main(_cfg(tmp_path, epochs=1))
    stats = trainer.main(_cfg(tmp_path, epochs=2))
    assert stats["epoch"] == 1  # resumed past epoch 0
    lines = open(os.path.join(tmp_path, "log.txt")).readlines()
    assert len(lines) == 2


def test_cli_update_freq_and_kd(tmp_path):
    """Gradient accumulation + KD-with-random-teacher paths execute."""
    stats = trainer.main(_cfg(tmp_path, update_freq=2, kd=True,
                              teacher_model="vit_small_patch16_224",
                              save_ckpt=False))
    assert "train_loss" in stats


def test_cli_eval_only(tmp_path):
    stats = trainer.main(_cfg(tmp_path, eval_only=True, save_ckpt=False))
    assert "acc1" in stats


def test_cli_explicit_resume(tmp_path):
    """--resume restores from a given Orbax dir (ADVICE r1: flag was parsed
    but never loaded) — both the checkpoints root and an epoch dir work."""
    src = tmp_path / "src"
    trainer.main(_cfg(src, epochs=1))
    dst = tmp_path / "dst"
    stats = trainer.main(_cfg(dst, epochs=2,
                              resume=str(src / "checkpoints")))
    assert stats["epoch"] == 1  # resumed past the source's epoch 0
    dst2 = tmp_path / "dst2"
    stats = trainer.main(_cfg(dst2, epochs=2,
                              resume=str(src / "checkpoints" / "0")))
    assert stats["epoch"] == 1


def test_cli_resume_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        trainer.main(_cfg(tmp_path, resume=str(tmp_path / "nope")))
