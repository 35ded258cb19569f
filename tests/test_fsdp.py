"""FSDP (ZeRO-3-style param sharding over the data axis) tests.

The reference replicates params and optimizer state on every core
(SURVEY §2.3 'FSDP/ZeRO: none'); this framework shards them over 'data'
with one flag (--param_sharding fsdp).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from vision_transformers_torch_xla_tpu.models.vit import VisionTransformer
from vision_transformers_torch_xla_tpu.parallel import sharding as shd
from vision_transformers_torch_xla_tpu.parallel.mesh import axis_rules, create_mesh
from vision_transformers_torch_xla_tpu.train.mixup import MixupConfig
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer
from vision_transformers_torch_xla_tpu.train.state import create_train_state
from vision_transformers_torch_xla_tpu.train.steps import StepConfig, make_train_step


def test_fsdp_rules_shard_embed_over_data(cpu_devices, tiny_model_kwargs):
    mesh = create_mesh([("data", 4)], devices=cpu_devices[:4])
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.ones((8, 32, 32, 3), jnp.float32)
    abstract = jax.eval_shape(lambda k: m.init(k, x, True),
                              {"params": jax.random.key(0)})
    shardings = shd.params_sharding(mesh, abstract, axis_rules("fsdp", mesh))["params"]
    # qkv kernel: (embed, qkv_out) -> embed sharded over data
    assert shardings["blocks_0"]["attn"]["qkv"]["kernel"].spec == P("data", None)
    # replicated rules leave it unsharded on a 1-axis mesh
    rep = shd.params_sharding(mesh, abstract,
                              axis_rules("replicated", mesh))["params"]
    assert rep["blocks_0"]["attn"]["qkv"]["kernel"].spec in (P(None, None), P())


def test_fsdp_train_step_matches_replicated(cpu_devices, tiny_model_kwargs):
    """Same batch, same init: FSDP loss == replicated loss."""
    m = VisionTransformer(**tiny_model_kwargs, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 10, 8))
    losses = {}
    for mode in ["replicated", "fsdp"]:
        mesh = create_mesh([("data", 4)], devices=cpu_devices[:4])
        abstract = jax.eval_shape(lambda k: m.init(k, x, True),
                                  {"params": jax.random.key(0)})
        shardings = shd.params_sharding(mesh, abstract,
                                        axis_rules(mode, mesh))["params"]
        init_fn = jax.jit(lambda k: nn.meta.unbox(m.init(k, x, True))["params"],
                          out_shardings=shardings)
        params = init_fn({"params": jax.random.key(0)})
        tx = create_optimizer("adamw", 1e-3, params)
        state = create_train_state(params, tx)
        cfg = StepConfig(mixup=MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.0,
                                           num_classes=10), num_classes=10)
        step = jax.jit(make_train_step(m.apply, tx, cfg))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ys = jax.device_put(labels, NamedSharding(mesh, P("data")))
        _, metrics = step(state, xs, ys, jax.random.key(0))
        losses[mode] = float(metrics["loss"])
    np.testing.assert_allclose(losses["fsdp"], losses["replicated"], rtol=2e-5)
