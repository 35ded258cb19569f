#!/usr/bin/env bash
# Multihost input-pipeline stress test: sharding uniqueness + throughput
# stability. Parity with reference run.sh:38-49 (32 loops x 128 samples).
set -euo pipefail

TPU_PREFIX=${TPU_PREFIX:?set TPU_PREFIX}
PROJECT=${PROJECT:?set PROJECT}
ZONE=${ZONE:?set ZONE}

python -m vision_transformers_torch_xla_tpu.launch.runner \
  --TPU_PREFIX "$TPU_PREFIX" --PROJECT "$PROJECT" --ZONE "$ZONE" \
  --COMMAND "python tools/test_loader_multihost.py \
    --data_set tfds --tfds_data_dir ${TFDS_DATA_DIR:-gs://imagenet-tfds} \
    --loops 32 --samples-per-loop 128 --min-rate 0.5 --min-ratio 0.6"
