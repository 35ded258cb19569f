from vision_transformers_torch_xla_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    init_distributed,
    LOGICAL_AXIS_RULES,
)
from vision_transformers_torch_xla_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    params_sharding,
    replicated,
)
