from vision_transformers_torch_xla_tpu.data.pp_builder import get_preprocess_fn, register_pp_op  # noqa: F401
from vision_transformers_torch_xla_tpu.data.loader import build_dataset  # noqa: F401
