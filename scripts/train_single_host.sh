#!/usr/bin/env bash
# Single-host example: ViT-Tiny/16, batch 256, lr 3e-3, 300 epochs.
# Parity with reference train/run_big_vision_example.sh:24-42.
set -euo pipefail

python -m vision_transformers_torch_xla_tpu.launch.main \
  --model my_vit_ti --input_size 224 --nb_classes 1000 \
  --data_set "${DATA_SET:-tfds}" --tfds_data_dir "${TFDS_DATA_DIR:-}" \
  --batch_size 256 --epochs 300 \
  --lr 3e-3 --warmup_epochs 20 --weight_decay 0.05 \
  --smoothing 0.1 --mixup 0.8 --cutmix 1.0 --drop_path 0.1 \
  --precision bf16 \
  --output_dir "${OUTPUT_DIR:-./output/vit_ti}" "$@"
