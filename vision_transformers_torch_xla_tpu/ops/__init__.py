from vision_transformers_torch_xla_tpu.ops.attention import multi_head_attention  # noqa: F401
