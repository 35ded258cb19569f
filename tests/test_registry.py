"""Registry/factory surface tests (reference models/_registry.py,_factory.py)."""
import pytest

from vision_transformers_torch_xla_tpu import create_model, list_models
from vision_transformers_torch_xla_tpu.models import is_model, split_model_name_tag
from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer


def test_expected_names_registered():
    names = list_models()
    # my_vit aliases (reference models/my_vit.py:84-165)
    for n in ["my_vit_mini", "my_vit_ti", "my_vit_xs", "my_vit_s", "my_vit_b", "my_vit_l"]:
        assert n in names
    for n in ["vit_tiny_patch16_224", "vit_base_patch16_224", "vit_large_patch16_224"]:
        assert n in names


def test_filtering():
    assert all("my_vit" in n for n in list_models("my_vit*"))
    assert "my_vit_b" not in list_models(exclude_filters="my_vit*")


def test_create_model_config_parity():
    """my_vit_* dims match reference models/my_vit.py table."""
    expect = {"my_vit_mini": (144, 12, 3), "my_vit_ti": (192, 12, 3),
              "my_vit_xs": (288, 12, 4), "my_vit_s": (384, 12, 6),
              "my_vit_b": (768, 12, 12), "my_vit_l": (1024, 24, 16)}
    for name, (d, depth, h) in expect.items():
        m = create_model(name)
        assert isinstance(m, VisionTransformer)
        assert (m.embed_dim, m.depth, m.num_heads) == (d, depth, h), name


def test_kwarg_overrides_and_none_filtering():
    m = create_model("my_vit_ti", num_classes=100, drop_path_rate=None)
    assert m.num_classes == 100
    assert m.drop_path_rate == 0.0  # None dropped -> default


def test_unknown_model_raises():
    with pytest.raises(RuntimeError):
        create_model("definitely_not_a_model")


def test_name_tag_split():
    assert split_model_name_tag("vit_base_patch16_224.augreg") == \
        ("vit_base_patch16_224", "augreg")
    assert is_model("my_vit_b.sometag")
