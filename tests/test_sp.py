"""Sequence-parallel (activation token-axis sharding) tests."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.parallel import sharding as shd
from vision_transformers_torch_xla_tpu.parallel.mesh import (
    SP_AXIS_RULES,
    axis_rules,
    create_mesh,
)
from vision_transformers_torch_xla_tpu.train.losses import cross_entropy


def test_sp_rules_shape():
    d = dict(SP_AXIS_RULES)
    assert d["seq_act"] == "model"   # activations shard over model
    assert d["seq"] is None          # params never shard their token axis
    assert d["heads"] is None        # TP disabled under SP
    assert d["batch"] == "data"


def test_sp_matches_replicated(cpu_devices, tiny_model_kwargs):
    mesh = create_mesh([("data", 2), ("model", 4)], devices=cpu_devices[:8])
    rules = axis_rules("sp", mesh)
    m = VisionTransformer(**{**tiny_model_kwargs, "patch_size": 4},
                          dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                    jnp.float32)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 10, 4))
    abstract = jax.eval_shape(lambda k: m.init(k, x, True),
                              {"params": jax.random.key(0)})
    shardings = shd.params_sharding(mesh, abstract, rules)["params"]
    init_fn = jax.jit(lambda k: nn.meta.unbox(m.init(k, x, True))["params"],
                      out_shardings=shardings)
    params = init_fn({"params": jax.random.key(0)})

    def loss_fn(p, xx, yy):
        with nn.logical_axis_rules(rules):
            return cross_entropy(m.apply({"params": p}, xx, True), yy)

    l_sp = float(jax.jit(loss_fn)(
        params,
        jax.device_put(x, NamedSharding(mesh, P("data"))),
        jax.device_put(y, NamedSharding(mesh, P("data")))))
    ref_params = nn.meta.unbox(
        m.init({"params": jax.random.key(0)}, x, True))["params"]
    l_ref = float(loss_fn(ref_params, x, y))
    np.testing.assert_allclose(l_sp, l_ref, rtol=2e-4)
