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
def base_run(tmp_path_factory):
    """ONE baseline 1-epoch training run shared (read-only) by the
    ckpt/log/resume tests below — each previously paid its own full
    main() (~30 s of compiles apiece on this 1-core box)."""
    path = tmp_path_factory.mktemp("cli_base")
    stats = trainer.main(_cfg(path))
    return path, stats


def test_cli_train_eval_ckpt_log(base_run):
    # vit_tiny at 32px: small enough for the CPU test host
    path, stats = base_run
    assert "acc1" in stats and "train_loss" in stats
    log_path = os.path.join(path, "log.txt")
    assert os.path.exists(log_path)
    rec = json.loads(open(log_path).readline())
    assert rec["epoch"] == 0
    assert os.path.isdir(os.path.join(path, "checkpoints", "0"))


def test_cli_resume_continues(base_run, tmp_path):
    """Auto-resume in the same output dir (on a copy, keeping the shared
    baseline pristine)."""
    import shutil

    base, _ = base_run
    work = tmp_path / "cont"
    shutil.copytree(base, work)
    stats = trainer.main(_cfg(work, epochs=2))
    assert stats["epoch"] == 1  # resumed past epoch 0
    lines = open(os.path.join(work, "log.txt")).readlines()
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


def test_cli_explicit_resume(base_run, tmp_path):
    """--resume restores from a given Orbax dir (ADVICE r1: flag was parsed
    but never loaded) — both the checkpoints root and an epoch dir work.
    Resumes from the shared baseline's checkpoints (read-only)."""
    src, _ = base_run
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
