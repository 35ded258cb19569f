"""vision_transformers_torch_xla_tpu — a TPU-native JAX framework for training
vision transformers at scale.

Re-designed from scratch for TPU (JAX / XLA / Pallas / jit-over-Mesh); capability
parity target is the torch_xla reference `TaiMingLu/vision_transformers_torch_xla`
(see SURVEY.md at the repo root for the blueprint).

Subpackages
-----------
core      -- config system, dtype policy, RNG discipline
parallel  -- device mesh, distributed init, sharding rules
models    -- model zoo: registry/factory + Flax ViT family (+ aliases)
ops       -- Pallas TPU kernels with jnp reference fallbacks
data      -- preprocessing-op registry + string DSL, input pipelines
train     -- optimizers, schedules, train/eval steps, EMA, KD, mixup
ckpt      -- Orbax checkpointing (save / rotate / auto-resume)
obs       -- metrics, loggers (TensorBoard / W&B / JSONL), profiler hooks
launch    -- CLI entrypoint and multihost runner
"""

__version__ = "0.1.0"

from vision_transformers_torch_xla_tpu.models import (  # noqa: F401
    create_model,
    list_models,
    register_model,
)
