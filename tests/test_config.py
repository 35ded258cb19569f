"""Config/CLI tests (reference main.py:144-352 flag surface)."""
import pytest

from vision_transformers_torch_xla_tpu.core.config import (
    TrainConfig,
    config_from_args,
    str2bool,
)


def test_defaults_match_reference_recipe():
    """Defaults mirror the reference's DeiT-style recipe (main.py:169-230)."""
    c = TrainConfig()
    assert c.lr == 4e-3 and c.weight_decay == 0.05
    assert c.warmup_epochs == 20 and c.min_lr == 1e-6
    assert c.smoothing == 0.1 and c.mixup == 0.8 and c.cutmix == 1.0
    assert c.epochs == 300 and c.model == "my_vit_b"


def test_cli_round_trip():
    c = config_from_args([
        "--model", "my_vit_ti", "--batch_size", "32", "--lr", "1e-3",
        "--model_ema", "true", "--opt_betas", "0.9", "0.95",
        "--mesh_shape", "data:8,model:4", "--kd", "1",
        "--teacher_model", "my_vit_b"])
    assert c.model == "my_vit_ti" and c.batch_size == 32
    assert c.model_ema is True and c.opt_betas == (0.9, 0.95)
    assert c.kd is True and c.teacher_model == "my_vit_b"


def test_mesh_parse():
    assert TrainConfig(mesh_shape="data").parse_mesh_shape() == [("data", -1)]
    assert TrainConfig(mesh_shape="data:8,model:4").parse_mesh_shape() == \
        [("data", 8), ("model", 4)]


def test_eval_batch_is_1_5x():
    """Parity: eval batch = 1.5x train (reference main.py:603)."""
    assert TrainConfig(batch_size=64).eval_batch_size() == 96


def test_str2bool():
    assert str2bool("yes") and str2bool("1") and not str2bool("false")
    with pytest.raises(Exception):
        str2bool("maybe")
