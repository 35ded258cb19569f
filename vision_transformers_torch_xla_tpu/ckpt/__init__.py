from vision_transformers_torch_xla_tpu.ckpt.checkpoint import CheckpointManager  # noqa: F401
from vision_transformers_torch_xla_tpu.ckpt.torch_compat import load_reference_checkpoint  # noqa: F401
from vision_transformers_torch_xla_tpu.ckpt.torch_export import (  # noqa: F401
    export_torch_state_dict,
    save_torch_checkpoint,
)
