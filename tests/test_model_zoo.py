"""One-forward-per-family zoo coverage (small inputs keep CPU compiles fast)."""
import jax
import jax.numpy as jnp
import pytest

from vision_transformers_torch_xla_tpu import create_model, list_models

# (name, kwargs, input hw)
FAMILIES = [
    ("my_vit_ti", dict(img_size=32), 32),
    ("convnext_atto", dict(), 64),
    ("mixer_s32_224", dict(img_size=32), 32),
    ("deit_tiny_patch16_224", dict(img_size=32), 32),
    ("efficientnet_b0", dict(), 64),
]


@pytest.mark.parametrize("name,kwargs,hw", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_family_forward(name, kwargs, hw):
    m = create_model(name, num_classes=10, dtype=jnp.float32, **kwargs)
    x = jnp.ones((1, hw, hw, 3), jnp.float32)
    vs = m.init({"params": jax.random.key(0)}, x, True)
    y = m.apply(vs, x, True)
    assert y.shape == (1, 10)
    assert y.dtype == jnp.float32


def test_zoo_size():
    names = list_models()
    assert len(names) >= 50
    # every family the reference CLI can reach plus the majors we add
    for family in ["my_vit", "vit_", "convnext", "deit", "mixer", "resnet",
                   "swin", "efficientnet"]:
        assert any(n.startswith(family) for n in names), family
