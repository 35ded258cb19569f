from vision_transformers_torch_xla_tpu.core.config import TrainConfig, build_argparser, config_from_args  # noqa: F401
from vision_transformers_torch_xla_tpu.core.dtypes import Policy, get_policy  # noqa: F401
from vision_transformers_torch_xla_tpu.core.rng import fold_in_step, make_rngs  # noqa: F401
