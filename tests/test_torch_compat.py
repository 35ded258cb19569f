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
        # token-pool timm ViT: trunk-final norm only (fc_norm is Identity
        # unless global_pool is avg/avgmax/max — reference :564-618)
        "norm.weight": t(dim), "norm.bias": t(dim),
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


# --- ResNet / Swin family converters ---------------------------------------

def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(l) for p, l in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _resnet_sd_from_flax(variables, seed=0):
    """Inverse-map our flax ResNet tree to a timm-named torch state dict.

    Exercises every name class the converter must handle; values are the
    flax leaves (torch-transposed) so a converted roundtrip is exact.
    """
    import re as _re

    sd = {}

    def put(name, arr):
        sd[name] = torch.from_numpy(np.ascontiguousarray(arr))

    deep = "stem_conv1" in variables["params"]
    for coll, kinds in (("params", ("scale", "bias")),
                        ("batch_stats", ("mean", "var"))):
        for key, leaf in _flat(variables.get(coll, {})).items():
            parts = [p.strip("'[]") for p in
                     _re.findall(r"\['[^']+'\]", key)]
            tname = {"scale": "weight", "bias": "bias",
                     "mean": "running_mean", "var": "running_var"}
            if parts[0].startswith("stages_"):
                m = _re.match(r"stages_(\d+)_blocks_(\d+)", parts[0])
                pre = f"layer{int(m.group(1)) + 1}.{m.group(2)}."
                mod, rest = parts[1], parts[2:]
                if mod.startswith("conv"):
                    put(pre + f"{mod}.weight", leaf.transpose(3, 2, 0, 1))
                elif mod == "downsample_conv":
                    put(pre + "downsample.0.weight",
                        leaf.transpose(3, 2, 0, 1))
                elif mod == "downsample_bn":
                    put(pre + f"downsample.1.{tname[rest[1]]}", leaf)
                elif mod.startswith("bn"):
                    put(pre + f"{mod}.{tname[rest[1]]}", leaf)
                elif mod == "attn_se_reduce":
                    k = "se.fc1.weight" if rest[0] == "kernel" else "se.fc1.bias"
                    put(pre + k, leaf.transpose(3, 2, 0, 1)
                        if rest[0] == "kernel" else leaf)
                elif mod == "attn_se_expand":
                    k = "se.fc2.weight" if rest[0] == "kernel" else "se.fc2.bias"
                    put(pre + k, leaf.transpose(3, 2, 0, 1)
                        if rest[0] == "kernel" else leaf)
                elif mod == "attn_eca_conv":
                    put(pre + "se.conv.weight", leaf.transpose(2, 1, 0))
                else:
                    raise AssertionError(f"test inverse-map misses {key}")
            elif parts[0] == "head":
                put("fc.weight" if parts[1] == "kernel" else "fc.bias",
                    leaf.T if parts[1] == "kernel" else leaf)
            elif parts[0] == "stem_conv":
                put("conv1.weight", leaf.transpose(3, 2, 0, 1))
            elif m := _re.match(r"stem_conv(\d)", parts[0]):
                idx = {"1": "0", "2": "3", "3": "6"}[m.group(1)]
                put(f"conv1.{idx}.weight", leaf.transpose(3, 2, 0, 1))
            elif parts[0] == "stem_bn" or (parts[0] == "stem_bn3" and deep):
                put(f"bn1.{tname[parts[2]]}", leaf)
            elif m := _re.match(r"stem_bn(\d)", parts[0]):
                idx = {"1": "1", "2": "4"}[m.group(1)]
                put(f"conv1.{idx}.{tname[parts[2]]}", leaf)
            elif parts[0] == "stem_pool_conv":
                put("maxpool.0.weight", leaf.transpose(3, 2, 0, 1))
            elif parts[0] == "stem_pool_bn":
                put(f"maxpool.1.{tname[parts[2]]}", leaf)
            else:
                raise AssertionError(f"test inverse-map misses {key}")
    return sd


def _assert_same_tree(converted, target, msg):
    flat_c, flat_t = _flat(converted), _flat(target)
    assert set(flat_c) == set(flat_t), (
        f"{msg}: extra={sorted(set(flat_c) - set(flat_t))[:5]} "
        f"missing={sorted(set(flat_t) - set(flat_c))[:5]}")
    for k in flat_t:
        assert tuple(flat_c[k].shape) == tuple(flat_t[k].shape), (msg, k)
        np.testing.assert_allclose(flat_c[k], flat_t[k], err_msg=(msg, k))


@pytest.mark.parametrize("name", ["resnet18", "resnet50d", "seresnet50",
                                  "ecaresnet50d"])
def test_resnet_converter_roundtrip_structure(name):
    """Every flax leaf (params AND batch_stats) is produced by converting a
    timm-named state dict, with exact values (transposes are involutions)."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_resnet_state_dict,
        detect_architecture,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model(name, num_classes=10, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), True),
        {"params": jax.random.key(0)})
    variables = jax.tree.map(
        lambda s: np.random.default_rng(0).normal(size=s.shape)
        .astype(np.float32), nn.meta.unbox(variables))
    sd = _resnet_sd_from_flax(variables)
    assert detect_architecture(sd) == "resnet"
    out = convert_resnet_state_dict(sd)
    _assert_same_tree(out["params"], variables["params"], f"{name} params")
    _assert_same_tree(out["batch_stats"], variables["batch_stats"],
                      f"{name} batch_stats")


def test_resnet_converted_forward():
    """Converted params + batch_stats drive a real eval-mode forward."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_resnet_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("resnet18", num_classes=10, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = nn.meta.unbox(m.init({"params": jax.random.key(0)}, x, True))
    sd = _resnet_sd_from_flax(jax.tree.map(np.asarray, init))
    out = convert_resnet_state_dict(sd)
    y = m.apply({"params": jax.tree.map(jnp.asarray, out["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray, out["batch_stats"])},
                x, True)
    ref = m.apply(init, x, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_swin_converter_roundtrip_structure():
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        _swin_merge_perm,
        convert_swin_state_dict,
        detect_architecture,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model
    import re as _re

    m = create_model("swin_tiny_patch4_window7_224", num_classes=10,
                     dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 224, 224, 3)), True),
        {"params": jax.random.key(0)})
    params = jax.tree.map(
        lambda s: np.random.default_rng(1).normal(size=s.shape)
        .astype(np.float32), nn.meta.unbox(variables))["params"]

    sd = {}

    def put(tname, arr):
        sd[tname] = torch.from_numpy(np.ascontiguousarray(arr))

    for key, leaf in _flat(params).items():
        parts = [p.strip("'[]") for p in _re.findall(r"\['[^']+'\]", key)]
        if parts[0] == "patch_embed":
            if parts[1] == "kernel":
                kk, d = leaf.shape
                p4 = int(round((kk // 3) ** 0.5))
                put("patch_embed.proj.weight",
                    leaf.reshape(p4, p4, 3, d).transpose(3, 2, 0, 1))
            else:
                put("patch_embed.proj.bias", leaf)
        elif parts[0] == "patch_norm":
            put("patch_embed.norm."
                + ("weight" if parts[1] == "scale" else "bias"), leaf)
        elif m2 := _re.match(r"merge_norm_(\d+)", parts[0]):
            inv = np.argsort(_swin_merge_perm(leaf.shape[0]))
            put(f"layers.{m2.group(1)}.downsample.norm."
                + ("weight" if parts[1] == "scale" else "bias"), leaf[inv])
        elif m2 := _re.match(r"merge_proj_(\d+)", parts[0]):
            inv = np.argsort(_swin_merge_perm(leaf.shape[0]))
            put(f"layers.{m2.group(1)}.downsample.reduction.weight",
                leaf.T[:, inv])
        elif m2 := _re.match(r"stages_(\d+)_blocks_(\d+)", parts[0]):
            pre = f"layers.{m2.group(1)}.blocks.{m2.group(2)}."
            if parts[1] in ("norm1", "norm2"):
                put(pre + f"{parts[1]}."
                    + ("weight" if parts[2] == "scale" else "bias"), leaf)
            elif parts[1] == "attn" and parts[2] == "rel_pos_bias_table":
                put(pre + "attn.relative_position_bias_table", leaf)
            elif parts[1] == "attn":
                put(pre + f"attn.{parts[2]}."
                    + ("weight" if parts[3] == "kernel" else "bias"),
                    leaf.T if parts[3] == "kernel" else leaf)
            elif parts[1] == "mlp":
                put(pre + f"mlp.{parts[2]}."
                    + ("weight" if parts[3] == "kernel" else "bias"),
                    leaf.T if parts[3] == "kernel" else leaf)
            else:
                raise AssertionError(f"swin inverse-map misses {key}")
        elif parts[0] == "norm":
            put("norm." + ("weight" if parts[1] == "scale" else "bias"), leaf)
        elif parts[0] == "head":
            put("head.fc." + ("weight" if parts[1] == "kernel" else "bias"),
                leaf.T if parts[1] == "kernel" else leaf)
        else:
            raise AssertionError(f"swin inverse-map misses {key}")
    # buffers the converter must skip
    sd["layers.0.blocks.0.attn.relative_position_index"] = torch.zeros(
        49, 49, dtype=torch.long)

    assert detect_architecture(sd) == "swin"
    out = convert_swin_state_dict(sd)
    _assert_same_tree(out, params, "swin params")


def test_swin_merge_permutation_numerics():
    """The reference PatchMerging flattens (w_sub, h_sub, c); ours flattens
    (h_sub, w_sub, c). With permuted norm/reduction weights the two paths
    must agree numerically (reference swin_transformer.py:476)."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        _swin_merge_perm,
    )

    rng = np.random.default_rng(2)
    c, out_dim = 6, 5
    x = rng.normal(size=(1, 4, 4, c)).astype(np.float32)
    g = rng.normal(size=(4 * c,)).astype(np.float32)
    b = rng.normal(size=(4 * c,)).astype(np.float32)
    w = rng.normal(size=(out_dim, 4 * c)).astype(np.float32)

    def ln(v, g, b):
        mu = v.mean(-1, keepdims=True)
        var = v.var(-1, keepdims=True)
        return (v - mu) / np.sqrt(var + 1e-5) * g + b

    # reference: permute(0,1,3,4,2,5) == (B, H2, W2, w_sub, h_sub, C)
    xt = x.reshape(1, 2, 2, 2, 2, c).transpose(0, 1, 3, 4, 2, 5) \
        .reshape(1, 2, 2, 4 * c)
    y_ref = ln(xt, g, b) @ w.T
    # ours: transpose(0,1,3,2,4,5) == (B, H2, W2, h_sub, w_sub, C)
    xo = x.reshape(1, 2, 2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(1, 2, 2, 4 * c)
    perm = _swin_merge_perm(4 * c)
    kernel_ours = w[:, perm].T          # what the converter produces (4C, out)
    y_ours = ln(xo, g[perm], b[perm]) @ kernel_ours
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-5, rtol=1e-5)


def _effnet_sd_from_flax(variables):
    """Inverse-map our flax effnet tree to timm names (per-block type from
    the flax key set, mirroring how the converter infers it from timm's)."""
    import re as _re
    from collections import defaultdict

    sd = {}

    def put(name, arr):
        sd[name] = torch.from_numpy(np.ascontiguousarray(arr))

    tname = {"scale": "weight", "bias": "bias",
             "mean": "running_mean", "var": "running_var"}
    # group flax modules per block to decide type
    block_mods = defaultdict(set)
    for key in _flat(variables["params"]):
        if m := _re.match(r"\['s(\d+)_b(\d+)_([a-z_]+)'\]", key):
            block_mods[(m.group(1), m.group(2))].add(m.group(3))

    def block_table(mods):
        if "pw_exp" in mods:   # InvertedResidual
            return {"pw_exp": "conv_pw", "pw_exp_norm": "bn1",
                    "dw": "conv_dw", "dw_norm": "bn2",
                    "pw_proj": "conv_pwl", "pw_proj_norm": "bn3"}
        if "conv_exp" in mods:  # EdgeResidual
            return {"conv_exp": "conv_exp", "conv_exp_norm": "bn1",
                    "pw_proj": "conv_pwl", "pw_proj_norm": "bn2"}
        if "dw" in mods:        # DepthwiseSeparable
            return {"dw": "conv_dw", "dw_norm": "bn1",
                    "pw_proj": "conv_pw", "pw_proj_norm": "bn2"}
        return {"conv": "conv", "norm": "bn1"}  # ConvBnAct

    for coll in ("params", "batch_stats"):
        for key, leaf in _flat(variables.get(coll, {})).items():
            parts = [p.strip("'[]") for p in _re.findall(r"\['[^']+'\]", key)]
            top = parts[0]
            if m := _re.match(r"s(\d+)_b(\d+)_([a-z_]+)", top):
                s, b, mod = m.group(1), m.group(2), m.group(3)
                pre = f"blocks.{s}.{b}."
                if mod.startswith("se_"):
                    t = f"se.conv_{mod[3:]}"
                    put(pre + f"{t}." + ("weight" if parts[1] == "kernel"
                                         else "bias"),
                        leaf.transpose(3, 2, 0, 1)
                        if parts[1] == "kernel" else leaf)
                    continue
                t = block_table(block_mods[(s, b)])[mod]
                if parts[1] == "conv":
                    put(pre + f"{t}.weight", leaf.transpose(3, 2, 0, 1))
                else:
                    put(pre + f"{t}.{tname[parts[2]]}", leaf)
            elif top == "stem_conv":
                put("conv_stem.weight", leaf.transpose(3, 2, 0, 1))
            elif top == "stem_norm":
                put(f"bn1.{tname[parts[2]]}", leaf)
            elif top == "head_conv":
                put("conv_head." + ("weight" if parts[2] == "kernel"
                                    else "bias"),
                    leaf.transpose(3, 2, 0, 1)
                    if parts[2] == "kernel" else leaf)
            elif top == "head_norm":
                put(f"bn2.{tname[parts[2]]}", leaf)
            elif top == "classifier":
                put("classifier." + ("weight" if parts[1] == "kernel"
                                     else "bias"),
                    leaf.T if parts[1] == "kernel" else leaf)
            else:
                raise AssertionError(f"effnet inverse-map misses {key}")
    return sd


@pytest.mark.parametrize("name", ["efficientnet_b0", "mobilenetv2_100",
                                  "efficientnetv2_rw_t", "tinynet_a"])
def test_efficientnet_converter_roundtrip_structure(name):
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_efficientnet_state_dict,
        detect_architecture,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model(name, num_classes=10, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), True),
        {"params": jax.random.key(0)})
    variables = jax.tree.map(
        lambda s: np.random.default_rng(0).normal(size=s.shape)
        .astype(np.float32), nn.meta.unbox(variables))
    sd = _effnet_sd_from_flax(variables)
    assert detect_architecture(sd) == "efficientnet"
    out = convert_efficientnet_state_dict(sd)
    _assert_same_tree(out["params"], variables["params"], f"{name} params")
    _assert_same_tree(out["batch_stats"], variables["batch_stats"],
                      f"{name} batch_stats")


def test_mobilenetv3_converted_forward():
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_mobilenetv3_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("lcnet_050", num_classes=10, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = nn.meta.unbox(m.init({"params": jax.random.key(0)}, x, True))
    sd = _mnv3_sd_from_flax(jax.tree.map(np.asarray, init))
    out = convert_mobilenetv3_state_dict(sd)
    y = m.apply({"params": jax.tree.map(jnp.asarray, out["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray, out["batch_stats"])},
                x, True)
    ref = m.apply(init, x, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def _mnv3_sd_from_flax(variables):
    """Inverse-map our flat-numbered MobileNetV3/LCNet tree to timm names:
    blocks_N -> blocks.N.0, head_conv/head_bn -> a trailing ConvBnAct block,
    head_fc -> conv_head (with bias)."""
    import re as _re
    from collections import defaultdict

    sd = {}

    def put(name, arr):
        sd[name] = torch.from_numpy(np.ascontiguousarray(arr))

    tname = {"scale": "weight", "bias": "bias",
             "mean": "running_mean", "var": "running_var"}
    block_mods = defaultdict(set)
    n_blocks = -1
    for key in _flat(variables["params"]):
        if m := _re.match(r"\['blocks_(\d+)_([a-z_]+)'\]", key):
            block_mods[m.group(1)].add(m.group(2))
            n_blocks = max(n_blocks, int(m.group(1)))
    has_head_conv = any(k.startswith("['head_conv']")
                        for k in _flat(variables["params"]))

    for coll in ("params", "batch_stats"):
        for key, leaf in _flat(variables.get(coll, {})).items():
            parts = [p.strip("'[]") for p in _re.findall(r"\['[^']+'\]", key)]
            top = parts[0]
            if m := _re.match(r"blocks_(\d+)_([a-z_]+)", top):
                n, mod = m.group(1), m.group(2)
                pre = f"blocks.{n}.0."
                ir = "pw_exp" in block_mods[n]
                table = ({"pw_exp": "conv_pw", "bn_exp": "bn1",
                          "dw": "conv_dw", "bn_dw": "bn2",
                          "pw": "conv_pwl", "bn_pw": "bn3"} if ir else
                         {"dw": "conv_dw", "bn_dw": "bn1",
                          "pw": "conv_pw", "bn_pw": "bn2"})
                if mod.startswith("se_"):
                    put(pre + f"se.conv_{mod[3:]}."
                        + ("weight" if parts[1] == "kernel" else "bias"),
                        leaf.transpose(3, 2, 0, 1)
                        if parts[1] == "kernel" else leaf)
                elif parts[1] == "kernel":
                    put(pre + f"{table[mod]}.weight",
                        leaf.transpose(3, 2, 0, 1))
                else:
                    put(pre + f"{table[mod]}.{tname[parts[1]]}", leaf)
            elif top == "stem_conv":
                put("conv_stem.weight", leaf.transpose(3, 2, 0, 1))
            elif top == "stem_bn":
                put(f"bn1.{tname[parts[1]]}", leaf)
            elif top == "head_conv":
                put(f"blocks.{n_blocks + 1}.0.conv.weight",
                    leaf.transpose(3, 2, 0, 1))
            elif top == "head_bn":
                put(f"blocks.{n_blocks + 1}.0.bn1.{tname[parts[1]]}", leaf)
            elif top == "head_fc":
                put("conv_head." + ("weight" if parts[1] == "kernel"
                                    else "bias"),
                    leaf.transpose(3, 2, 0, 1)
                    if parts[1] == "kernel" else leaf)
            elif top == "classifier":
                put("classifier." + ("weight" if parts[1] == "kernel"
                                     else "bias"),
                    leaf.T if parts[1] == "kernel" else leaf)
            else:
                raise AssertionError(f"mnv3 inverse-map misses {key}")
    del has_head_conv
    return sd


@pytest.mark.parametrize("name", ["mobilenetv3_large_100", "lcnet_100"])
def test_mobilenetv3_converter_roundtrip_structure(name):
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_mobilenetv3_state_dict,
        detect_architecture,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model(name, num_classes=10, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda k: m.init(k, jnp.zeros((1, 64, 64, 3)), True),
        {"params": jax.random.key(0)})
    variables = jax.tree.map(
        lambda s: np.random.default_rng(0).normal(size=s.shape)
        .astype(np.float32), nn.meta.unbox(variables))
    sd = _mnv3_sd_from_flax(variables)
    assert detect_architecture(sd) == "mobilenetv3"
    out = convert_mobilenetv3_state_dict(sd)
    _assert_same_tree(out["params"], variables["params"], f"{name} params")
    _assert_same_tree(out["batch_stats"], variables["batch_stats"],
                      f"{name} batch_stats")


# --- torch export (bidirectional compat) ------------------------------------

def _rand_variables(model, img=64):
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, img, img, 3)), True),
        {"params": jax.random.key(0)})
    return jax.tree.map(
        lambda s: np.random.default_rng(3).normal(size=s.shape)
        .astype(np.float32), nn.meta.unbox(variables))


@pytest.mark.parametrize("name,arch", [
    ("resnet50d", "resnet"),
    ("seresnet50", "resnet"),
    ("swin_tiny_patch4_window7_224", "swin"),
    ("efficientnet_b0", "efficientnet"),
    ("mobilenetv3_large_100", "mobilenetv3"),
    ("lcnet_100", "mobilenetv3"),
    ("regnetx_002", "regnet"),
    ("regnety_002", "regnet"),
    ("regnetz_005", "regnet"),
    ("regnetv_040", "regnet"),
    ("vgg11", "vgg"),
    ("vgg13_bn", "vgg"),
    ("densenet121", "densenet"),
    ("densenetblur121d", "densenet"),
    ("ghostnet_100", "ghostnet"),
    ("ghostnetv2_100", "ghostnet"),
    ("resnetv2_50x1_bit", "resnetv2"),
    ("resnetv2_50d", "resnetv2"),
    ("resnetv2_18", "resnetv2"),
    ("maxvit_pico_rw_256", "maxxvit"),
    ("coatnet_pico_rw_224", "maxxvit"),
    ("coatnet_nano_cc_224", "maxxvit"),
    ("maxvit_tiny_pm_256", "maxxvit"),
    ("maxxvit_rmlp_nano_rw_256", "maxxvit"),
    # metaformer: v1 (GroupNorm1+LayerScale), poolformerv2 (ResScale,
    # plain head), caformer (sep+attn mixers, MlpHead, downsample norms)
    ("poolformer_s12", "metaformer"),
    ("poolformerv2_s12", "metaformer"),
    ("caformer_s18", "metaformer"),
])
def test_export_import_roundtrip(name, arch):
    """export -> timm names -> convert must reproduce the flax tree exactly,
    with the family inferred from the flax tree."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model(name, num_classes=10, dtype=jnp.float32)
    variables = _rand_variables(m, img=224 if arch == "swin" else 64)
    assert detect_flax_architecture(variables["params"]) == arch
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == arch
    out = {
        "resnet": tc.convert_resnet_state_dict,
        "swin": tc.convert_swin_state_dict,
        "efficientnet": tc.convert_efficientnet_state_dict,
        "mobilenetv3": tc.convert_mobilenetv3_state_dict,
        "regnet": tc.convert_regnet_state_dict,
        "vgg": tc.convert_vgg_state_dict,
        "densenet": tc.convert_densenet_state_dict,
        "ghostnet": tc.convert_ghostnet_state_dict,
        "resnetv2": tc.convert_resnetv2_state_dict,
        "maxxvit": tc.convert_maxxvit_state_dict,
        "metaformer": tc.convert_metaformer_state_dict,
    }[arch](sd)
    if arch in ("swin", "metaformer"):  # bare-params converters
        _assert_same_tree(out, variables["params"], f"{name} params")
    else:
        _assert_same_tree(out["params"], variables["params"], f"{name} params")
        _assert_same_tree(out.get("batch_stats") or {},
                          variables.get("batch_stats") or {},
                          f"{name} batch_stats")


def test_export_vit_matches_handwritten_sd(tiny_model_kwargs):
    """Export must emit timm's literal key set: convert the handwritten timm
    sd, export it back, and compare name-for-name and value-for-value."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_torch_state_dict,
    )

    sd = _timm_like_sd()
    params = convert_vit_state_dict(sd)
    back = export_torch_state_dict({"params": params}, arch="vit")
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), err_msg=k)


def test_export_convnext_matches_handwritten_sd():
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_convnext_state_dict,
    )
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_torch_state_dict,
    )

    sd = _convnext_like_sd()
    params = convert_convnext_state_dict(sd)
    back = export_torch_state_dict({"params": params}, arch="convnext")
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), err_msg=k)


def test_save_torch_checkpoint_file_roundtrip(tmp_path):
    """save_torch_checkpoint output loads through load_reference_checkpoint
    (the reference's --finetune path shape: {'model': sd, ...})."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        save_torch_checkpoint,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("resnet18", num_classes=10, dtype=jnp.float32)
    variables = _rand_variables(m)
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(path, variables, extra={"epoch": 7})
    loaded = load_reference_checkpoint(path)
    _assert_same_tree(loaded["params"], variables["params"], "file roundtrip")
    _assert_same_tree(loaded["batch_stats"], variables["batch_stats"],
                      "file roundtrip stats")


def test_convert_checkpoint_cli(tmp_path):
    """tools/convert_checkpoint.py import + export end-to-end."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "convert_checkpoint.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    # import: vit .pth -> local-dir
    sd = _timm_like_sd()
    pth = str(tmp_path / "ref.pth")
    torch.save({"model": sd}, pth)
    outdir = str(tmp_path / "imported")
    assert cli.main(["import", pth, outdir,
                     "--architecture", "vit_tiny_patch16_224"]) == 0
    assert os.path.exists(os.path.join(outdir, "model.npz"))
    assert os.path.exists(os.path.join(outdir, "config.json"))

    # export: the imported local-dir back to .pth, compare to the original
    back = str(tmp_path / "back.pth")
    assert cli.main(["export", outdir, back, "--arch", "vit"]) == 0
    sd2 = torch.load(back, weights_only=False)["model"]
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_allclose(sd2[k].numpy(), sd[k].numpy(), err_msg=k)


@pytest.mark.parametrize("name", ["mixer_s16_224", "resmlp_12_224",
                                  "gmlp_ti16_224", "gmixer_12_224"])
def test_mixer_export_import_roundtrip(name):
    """Mixer-family: export flax -> timm names -> convert reproduces the
    tree; both detectors agree on the family."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model(name, num_classes=10, dtype=jnp.float32)
    variables = _rand_variables(m, img=224)
    assert detect_flax_architecture(variables["params"]) == "mixer"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "mixer"
    out = tc.convert_mixer_state_dict(sd)
    _assert_same_tree(out, variables["params"], f"{name} params")


def test_regnet_export_key_naming():
    """Exported keys must be timm's literal RegNet names in all three
    layouts: ConvNormAct (non-preact), bare-conv preact, and the avg-pool
    Sequential downsample (reference regnet.py:139-222, :261-433)."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("regnety_002", num_classes=10, dtype=jnp.float32)
    keys = set(export_torch_state_dict(_rand_variables(m, img=64)))
    assert "stem.conv.weight" in keys and "stem.bn.running_mean" in keys
    assert "s1.b1.conv1.conv.weight" in keys
    assert "s1.b1.conv2.bn.running_var" in keys
    assert "s1.b1.se.fc1.weight" in keys and "s1.b1.se.fc2.bias" in keys
    assert "s1.b1.downsample.conv.weight" in keys
    assert "s1.b1.downsample.bn.weight" in keys
    assert "head.fc.weight" in keys
    assert not any(k.startswith("final_conv") for k in keys)

    mv = create_model("regnetv_040", num_classes=10, dtype=jnp.float32)
    vv = _rand_variables(mv, img=64)
    pkeys = set(export_torch_state_dict(vv))
    assert "stem.weight" in pkeys and "stem.bn.weight" not in pkeys
    assert "s1.b1.norm1.running_mean" in pkeys
    assert "s1.b1.conv1.weight" in pkeys  # bare preact conv
    assert "s1.b1.downsample.weight" in pkeys
    akeys = set(export_torch_state_dict(vv, avg_down=True))
    assert "s1.b1.downsample.1.weight" in akeys

    # regnetz: no-shortcut + final_conv head
    mz = create_model("regnetz_005", num_classes=10, dtype=jnp.float32)
    zkeys = set(export_torch_state_dict(_rand_variables(mz, img=64)))
    assert "final_conv.conv.weight" in zkeys
    assert "final_conv.bn.running_mean" in zkeys
    assert not any(".downsample." in k for k in zkeys)


def test_beit_export_import_roundtrip():
    """BEiT: export flax -> timm names (separate q/v biases, gamma_N layer
    scale, per-block rel-pos tables) -> convert reproduces the tree."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("beit_base_patch16_224", embed_dim=64, depth=2,
                     num_heads=2, img_size=32, num_classes=10,
                     dtype=jnp.float32)
    variables = _rand_variables(m, img=32)
    assert detect_flax_architecture(variables["params"]) == "beit"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "beit"
    assert "blocks.0.attn.q_bias" in sd and "blocks.1.gamma_2" in sd
    assert "blocks.0.attn.relative_position_bias_table" in sd
    out = tc.convert_beit_state_dict(sd)
    _assert_same_tree(out, variables["params"], "beit params")


def test_cait_export_import_roundtrip():
    """CaiT: export flax -> timm names (talking-heads proj_l/proj_w, bare
    gamma_N in both block kinds, separate q/k/v in class-attention) ->
    convert reproduces the tree."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("cait_xxs24_224", embed_dim=64, depth=2, num_heads=2,
                     img_size=32, num_classes=10, dtype=jnp.float32)
    variables = _rand_variables(m, img=32)
    assert detect_flax_architecture(variables["params"]) == "cait"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "cait"
    assert "blocks.0.attn.proj_l.weight" in sd
    assert "blocks.1.gamma_2" in sd
    assert "blocks_token_only.0.attn.q.weight" in sd
    assert "blocks_token_only.1.gamma_1" in sd
    out = tc.convert_cait_state_dict(sd)
    _assert_same_tree(out, variables["params"], "cait params")


def test_xcit_export_import_roundtrip():
    """XCiT: export flax -> timm names (Sequential conv patch stem, Fourier
    token_projection 1x1 conv, XCA temperature, LPI depthwise+BN, bare
    gammaN) -> convert reproduces the tree incl. batch_stats."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("xcit_nano_12_p16_224", embed_dim=64, depth=2,
                     num_heads=2, img_size=32, num_classes=10,
                     dtype=jnp.float32)
    variables = _rand_variables(m, img=32)
    assert detect_flax_architecture(variables["params"]) == "xcit"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "xcit"
    assert "patch_embed.proj.0.0.weight" in sd
    assert "patch_embed.proj.6.1.running_mean" in sd
    assert "pos_embed.token_projection.weight" in sd
    assert sd["pos_embed.token_projection.weight"].shape == (64, 64, 1, 1)
    assert "blocks.0.attn.temperature" in sd
    assert "blocks.1.local_mp.conv2.weight" in sd
    assert "blocks.0.gamma3" in sd
    assert "cls_attn_blocks.0.attn.q.weight" in sd
    out = tc.convert_xcit_state_dict(sd)
    _assert_same_tree(out["params"], variables["params"], "xcit params")
    _assert_same_tree(out["batch_stats"], variables["batch_stats"],
                      "xcit batch_stats")


def test_pvt2_export_import_roundtrip():
    """PVTv2: export flax -> timm names (stem patch_embed vs per-stage
    downsample nesting, SR conv + norm, depthwise-conv MLP) -> convert
    reproduces the tree. Covers the linear (b2_li) pooled-KV layout too."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    for name in ("pvt_v2_b0", "pvt_v2_b2_li"):
        m = create_model(name, num_classes=10, dtype=jnp.float32,
                         depths=(1, 1, 1, 1))
        variables = _rand_variables(m, img=64)
        assert detect_flax_architecture(variables["params"]) == "pvt2"
        sd = {k: torch.from_numpy(v) for k, v in
              export_torch_state_dict(variables).items()}
        assert tc.detect_architecture(sd) == "pvt2"
        assert "patch_embed.proj.weight" in sd
        assert "stages.1.downsample.proj.weight" in sd
        assert "stages.0.blocks.0.attn.kv.weight" in sd
        assert "stages.0.blocks.0.mlp.dwconv.weight" in sd
        assert "stages.3.norm.weight" in sd
        out = tc.convert_pvt2_state_dict(sd)
        _assert_same_tree(out, variables["params"], f"{name} params")


def test_convnextv2_grn_export_import_roundtrip():
    """ConvNeXt-V2: GRN gamma/beta map to timm's mlp.grn.weight/bias and no
    layer-scale gamma is emitted."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("convnextv2_atto", num_classes=10, dtype=jnp.float32,
                     depths=(1, 1, 1, 1))
    variables = _rand_variables(m, img=64)
    assert detect_flax_architecture(variables["params"]) == "convnext"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "convnext"
    assert "stages.0.blocks.0.mlp.grn.weight" in sd
    assert not any(k.endswith(".gamma") for k in sd)  # v2 has no layerscale
    out = tc.convert_convnext_state_dict(sd)
    _assert_same_tree(out, variables["params"], "convnextv2 params")


@pytest.mark.parametrize("name,kwargs", [
    ("deit3_small_patch16_224", dict(embed_dim=64, depth=2, num_heads=2,
                                     img_size=32)),
    ("deit_tiny_distilled_patch16_224", dict(embed_dim=64, depth=2,
                                             num_heads=2, img_size=32)),
])
def test_deit_family_rides_vit_converter(name, kwargs):
    """DeiT3 (ViT + LayerScale) and distilled DeiT (dist token + dual head)
    roundtrip through the ViT converter pair."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model(name, num_classes=10, dtype=jnp.float32, **kwargs)
    variables = _rand_variables(m, img=32)
    assert detect_flax_architecture(variables["params"]) == "vit"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "vit"
    if "deit3" in name:
        assert "blocks.0.ls1.gamma" in sd
    else:
        assert "dist_token" in sd and "head_dist.weight" in sd
    out = tc.convert_vit_state_dict(sd)
    _assert_same_tree(out, variables["params"], f"{name} params")


def test_swinv2_export_import_roundtrip():
    """SwinV2: export flax -> timm names (q/v biases, logit_scale, cpb MLP,
    v2 reduction-then-norm PatchMerging with channel-order permutation) ->
    convert reproduces the tree."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("swinv2_tiny_window8_256", num_classes=10,
                     dtype=jnp.float32, img_size=64, window_size=4,
                     depths=(1, 1, 1, 1))
    variables = _rand_variables(m, img=64)
    assert detect_flax_architecture(variables["params"]) == "swinv2"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables).items()}
    assert tc.detect_architecture(sd) == "swinv2"
    assert "layers.0.blocks.0.attn.logit_scale" in sd
    assert "layers.0.blocks.0.attn.q_bias" in sd
    assert "layers.0.blocks.0.attn.cpb_mlp.0.weight" in sd
    assert "layers.0.blocks.0.attn.cpb_mlp.2.weight" in sd
    assert "layers.1.downsample.reduction.weight" in sd
    assert not any(k.endswith("k_bias") for k in sd)
    out = tc.convert_swinv2_state_dict(sd)
    _assert_same_tree(out, variables["params"], "swinv2 params")


def test_eva_export_import_roundtrip_separate_qkv():
    """EVA02 base layout: separate q/k/v projections (k bias preserved),
    SwiGLU with inner norm, bare gamma_N, fc_norm head."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        detect_flax_architecture,
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("eva02_base_patch14_224", num_classes=10,
                     dtype=jnp.float32, img_size=56, embed_dim=64, depth=2,
                     num_heads=2, init_values=1e-5)
    variables = _rand_variables(m, img=56)
    assert detect_flax_architecture(variables["params"]) == "eva"
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables, qkv_fused=False).items()}
    assert tc.detect_architecture(sd) == "eva"
    assert "blocks.0.attn.q_proj.weight" in sd
    assert "blocks.0.attn.k_proj.bias" in sd
    assert "blocks.0.mlp.fc1_g.weight" in sd and "blocks.0.mlp.norm.weight" in sd
    assert "blocks.1.gamma_2" in sd and "fc_norm.weight" in sd
    out = tc.convert_eva_state_dict(sd)
    _assert_same_tree(out, variables["params"], "eva02-base params")


def test_eva_export_import_roundtrip_fused_glu():
    """EVA02 tiny layout: fused qkv + q/v biases (k bias zeroed for the
    drop-free roundtrip) and packed GluMlp fc1 (gate first, no norm)."""
    import numpy as np
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("eva02_tiny_patch14_224", num_classes=10,
                     dtype=jnp.float32, img_size=56, embed_dim=64, depth=2,
                     num_heads=2)
    variables = _rand_variables(m, img=56)
    # zero the k third of each qkv bias: timm's fused layout has no k bias
    for blk in variables["params"].values():
        if isinstance(blk, dict) and "attn" in blk:
            b = np.array(blk["attn"]["qkv"]["bias"])
            d = b.shape[0] // 3
            b[d:2 * d] = 0
            blk["attn"]["qkv"]["bias"] = b
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables, arch="eva").items()}
    assert tc.detect_architecture(sd) == "eva"
    assert "blocks.0.attn.qkv.weight" in sd
    assert "blocks.0.attn.q_bias" in sd and "blocks.0.attn.v_bias" in sd
    assert not any(k.endswith("k_bias") for k in sd)
    assert "blocks.0.mlp.fc1.weight" in sd  # packed GluMlp
    assert sd["blocks.0.mlp.fc1.weight"].shape[0] == \
        2 * sd["blocks.0.mlp.fc2.weight"].shape[1]
    assert "blocks.0.mlp.norm.weight" not in sd
    out = tc.convert_eva_state_dict(sd)
    _assert_same_tree(out, variables["params"], "eva02-tiny params")


def test_eva_plain_mlp_and_attn_pool_roundtrip():
    """Perception-Encoder layout: plain MLP (mlp.fcN), norm_pre, map
    pooling through AttentionPoolLatent."""
    from vision_transformers_torch_xla_tpu.ckpt import torch_compat as tc
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_torch_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("vit_pe_core_base_patch16_224", num_classes=10,
                     dtype=jnp.float32, img_size=64, embed_dim=64, depth=2,
                     num_heads=2)
    variables = _rand_variables(m, img=64)
    sd = {k: torch.from_numpy(v) for k, v in
          export_torch_state_dict(variables, arch="eva",
                                  qkv_fused=False).items()}
    assert "norm_pre.weight" in sd
    assert "blocks.0.mlp.fc1.weight" in sd
    assert sd["blocks.0.mlp.fc1.weight"].shape[0] != \
        2 * sd["blocks.0.mlp.fc2.weight"].shape[1]  # plain, not packed
    assert "attn_pool.latent" in sd and "attn_pool.kv.weight" in sd
    assert "patch_embed.proj.bias" not in sd  # pre-norm trunk: bias-free
    out = tc.convert_eva_state_dict(sd)
    _assert_same_tree(out, variables["params"], "vit_pe params")


def test_maxvit_tf_layout_roundtrip():
    """tf variants: head_first=False qkv rows + RelPosBiasTf (heads, L)
    table orientation, auto-detected by the importer from the table."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_maxxvit_state_dict,
    )
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_maxxvit_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("maxvit_tiny_tf_224", num_classes=10,
                     dtype=jnp.float32)
    variables = _rand_variables(m, img=64)
    sd = {k: torch.from_numpy(v) for k, v in
          export_maxxvit_state_dict(variables, tf=True).items()}
    # tf table orientation: (heads, L) — transposed vs our (L, heads)
    k0 = "stages.0.blocks.0.attn_block.attn.rel_pos." \
         "relative_position_bias_table"
    flax_t = variables["params"]["s0_b0_win"]["rel_pos"]["rel_pos_table"]
    np.testing.assert_allclose(sd[k0].numpy(), np.asarray(flax_t).T)
    out = convert_maxxvit_state_dict(sd)
    _assert_same_tree(out["params"], variables["params"], "tf params")
    _assert_same_tree(out.get("batch_stats") or {},
                      variables.get("batch_stats") or {}, "tf stats")


def test_coatnet_se_early_export_naming():
    """conv_attn_early coatnets name the SE module `se_early` in timm."""
    from vision_transformers_torch_xla_tpu.ckpt.torch_compat import (
        convert_maxxvit_state_dict,
    )
    from vision_transformers_torch_xla_tpu.ckpt.torch_export import (
        export_maxxvit_state_dict,
    )
    from vision_transformers_torch_xla_tpu.models.factory import create_model

    m = create_model("coatnet_0_rw_224", num_classes=10, dtype=jnp.float32)
    variables = _rand_variables(m, img=64)
    sd = export_maxxvit_state_dict(variables, se_early=True)
    assert any(".se_early.fc1.weight" in k for k in sd)
    assert not any(".se.fc1" in k for k in sd)
    out = convert_maxxvit_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()})
    _assert_same_tree(out["params"], variables["params"], "se_early params")
