from vision_transformers_torch_xla_tpu.train.schedules import cosine_scheduler, cosine_schedule_fn  # noqa: F401
from vision_transformers_torch_xla_tpu.train.optim import create_optimizer  # noqa: F401
from vision_transformers_torch_xla_tpu.train.state import TrainState, create_train_state  # noqa: F401
from vision_transformers_torch_xla_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
