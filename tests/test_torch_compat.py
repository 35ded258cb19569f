"""Torch-checkpoint converter tests (ckpt/torch_compat.py)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer  # noqa: E402
from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (  # noqa: E402
    convert_vit_state_dict,
    load_reference_checkpoint,
)


def _timm_like_sd(dim=64, depth=2, heads=2, patch=16, seq=5, classes=10):
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {
        "cls_token": t(1, 1, dim),
        "pos_embed": t(1, seq, dim),
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "norm.weight": t(dim), "norm.bias": t(dim),
        "fc_norm.weight": t(dim), "fc_norm.bias": t(dim),
        "head.weight": t(classes, dim), "head.bias": t(classes),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        sd.update({
            p + "norm1.weight": t(dim), p + "norm1.bias": t(dim),
            p + "attn.qkv.weight": t(3 * dim, dim), p + "attn.qkv.bias": t(3 * dim),
            p + "attn.proj.weight": t(dim, dim), p + "attn.proj.bias": t(dim),
            p + "norm2.weight": t(dim), p + "norm2.bias": t(dim),
            p + "mlp.fc1.weight": t(4 * dim, dim), p + "mlp.fc1.bias": t(4 * dim),
            p + "mlp.fc2.weight": t(dim, 4 * dim), p + "mlp.fc2.bias": t(dim),
        })
    return sd


def test_convert_structure_and_shapes(tiny_model_kwargs):
    sd = _timm_like_sd()
    params = convert_vit_state_dict(sd)

    model = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    target = nn.meta.unbox(model.init({"params": jax.random.key(0)}, x, True))["params"]

    flat_t = {jax.tree_util.keystr(p): l.shape for p, l in
              jax.tree_util.tree_flatten_with_path(target)[0]}
    flat_c = {jax.tree_util.keystr(p): l.shape for p, l in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    assert set(flat_c) == set(flat_t)
    for k in flat_t:
        assert tuple(flat_c[k]) == tuple(flat_t[k]), k


def test_linear_transpose_and_conv_reshape():
    sd = _timm_like_sd()
    params = convert_vit_state_dict(sd)
    w = sd["blocks.0.attn.qkv.weight"].numpy()
    np.testing.assert_allclose(params["blocks_0"]["attn"]["qkv"]["kernel"], w.T)
    conv = sd["patch_embed.proj.weight"].numpy()  # OIHW
    want = conv.transpose(2, 3, 1, 0).reshape(16 * 16 * 3, 64)
    np.testing.assert_allclose(params["patch_embed"]["proj"]["kernel"], want)


def test_load_reference_checkpoint_pickle(tmp_path):
    """Full .pth round trip incl. 'model' key + 'module.' prefix stripping."""
    sd = {("module." + k): v for k, v in _timm_like_sd().items()}
    path = tmp_path / "checkpoint-3.pth"
    torch.save({"model": sd, "epoch": 3, "optimizer": {}}, path)
    params = load_reference_checkpoint(str(path))
    assert "blocks_1" in params and "patch_embed" in params


def test_converted_forward_runs(tiny_model_kwargs):
    """Grafted params actually drive a forward pass."""
    sd = _timm_like_sd()
    loaded = convert_vit_state_dict(sd)
    model = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    init = nn.meta.unbox(model.init({"params": jax.random.key(0)}, x, True))["params"]
    grafted = jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype), init, loaded)
    y = model.apply({"params": grafted}, x, True)
    assert y.shape == (1, 10) and bool(jnp.isfinite(y).all())


def _convnext_like_sd(dims=(8, 16), depths=(1, 1), classes=10):
    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {"stem.0.weight": t(dims[0], 3, 4, 4), "stem.0.bias": t(dims[0]),
          "stem.1.weight": t(dims[0]), "stem.1.bias": t(dims[0]),
          "head.norm.weight": t(dims[-1]), "head.norm.bias": t(dims[-1]),
          "head.fc.weight": t(classes, dims[-1]), "head.fc.bias": t(classes)}
    for s, (dim, depth) in enumerate(zip(dims, depths)):
        if s > 0:
            sd.update({
                f"stages.{s}.downsample.0.weight": t(dims[s - 1]),
                f"stages.{s}.downsample.0.bias": t(dims[s - 1]),
                f"stages.{s}.downsample.1.weight": t(dim, dims[s - 1], 2, 2),
                f"stages.{s}.downsample.1.bias": t(dim)})
        for b in range(depth):
            p = f"stages.{s}.blocks.{b}."
            sd.update({
                p + "gamma": t(dim),
                p + "conv_dw.weight": t(dim, 1, 7, 7),
                p + "conv_dw.bias": t(dim),
                p + "norm.weight": t(dim), p + "norm.bias": t(dim),
                p + "mlp.fc1.weight": t(4 * dim, dim), p + "mlp.fc1.bias": t(4 * dim),
                p + "mlp.fc2.weight": t(dim, 4 * dim), p + "mlp.fc2.bias": t(dim)})
    return sd


def test_convnext_convert_structure_and_forward():
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_convnext_state_dict,
        detect_architecture,
    )
    from vision_transformers_torch_xla_tpu.models.convnext import ConvNeXt

    sd = _convnext_like_sd()
    assert detect_architecture(sd) == "convnext"
    loaded = convert_convnext_state_dict(sd)

    model = ConvNeXt(depths=(1, 1), dims=(8, 16), num_classes=10,
                     dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    init = nn.meta.unbox(model.init({"params": jax.random.key(0)}, x, True))["params"]

    flat_i = {jax.tree_util.keystr(p): l.shape for p, l in
              jax.tree_util.tree_flatten_with_path(init)[0]}
    flat_l = {jax.tree_util.keystr(p): l.shape for p, l in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}
    assert set(flat_l) == set(flat_i)
    for k in flat_i:
        assert tuple(flat_l[k]) == tuple(flat_i[k]), k

    grafted = jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype), init, loaded)
    y = model.apply({"params": grafted}, x, True)
    assert y.shape == (1, 10) and bool(jnp.isfinite(y).all())


def test_load_orbax_dir_as_teacher(tmp_path, tiny_model_kwargs):
    """--teacher_path/--finetune accept this framework's own Orbax dirs."""
    from vision_transformers_torch_xla_tpu.ckpt.checkpoint import CheckpointManager
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        load_reference_checkpoint,
    )
    from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
    from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
    from vision_transformers_torch_xla_tpu.train.state import create_train_state

    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = nn.meta.unbox(m.init({"params": jax.random.key(0)}, x, True))["params"]
    tx = create_optimizer("sgd", 0.1, params)
    state = create_train_state(params, tx, with_ema=True)
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(0, state, metadata={"epoch": 0})
    mngr.wait()
    mngr.close()

    loaded = load_reference_checkpoint(str(tmp_path / "ck"))
    assert "blocks_0" in loaded
    np.testing.assert_allclose(
        np.asarray(loaded["head"]["kernel"]),
        np.asarray(params["head"]["kernel"]))
