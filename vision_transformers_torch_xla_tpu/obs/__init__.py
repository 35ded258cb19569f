from vision_transformers_torch_xla_tpu.obs.metrics import MetricLogger, SmoothedValue  # noqa: F401
from vision_transformers_torch_xla_tpu.obs.loggers import (  # noqa: F401
    JsonlLogger,
    TensorboardLogger,
    WandbLogger,
    build_loggers,
)
