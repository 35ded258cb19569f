#!/usr/bin/env bash
# Flagship run: ViT-B/16, 300 epochs, global batch 4096, TPU v4-64.
# Parity with the reference's run_train.sh:14-69 recipe, re-expressed for the
# JAX process-per-host model: 8 hosts x 8 chips; per-host batch = 4096/8 = 512.
set -euo pipefail

TPU_PREFIX=${TPU_PREFIX:?set TPU_PREFIX}
PROJECT=${PROJECT:?set PROJECT}
ZONE=${ZONE:?set ZONE}
GLOBAL_BATCH=${GLOBAL_BATCH:-4096}
NUM_HOSTS=${NUM_HOSTS:-8}
PER_HOST_BATCH=$((GLOBAL_BATCH / NUM_HOSTS))

python -m vision_transformers_torch_xla_tpu.launch.runner \
  --TPU_PREFIX "$TPU_PREFIX" --PROJECT "$PROJECT" --ZONE "$ZONE" \
  --COMMAND "python -m vision_transformers_torch_xla_tpu.launch.main \
    --model my_vit_b --input_size 224 --nb_classes 1000 \
    --data_set tfds --tfds_data_dir ${TFDS_DATA_DIR:-gs://imagenet-tfds} \
    --batch_size ${PER_HOST_BATCH} --epochs 300 \
    --lr 4e-3 --min_lr 1e-6 --warmup_epochs 20 --warmup_lr 1e-6 \
    --weight_decay 0.05 --opt adamw \
    --smoothing 0.1 --mixup 0.8 --cutmix 1.0 --drop_path 0.1 \
    --act_layer gelu_tanh \
    --model_ema true --model_ema_decay 0.9999 \
    --precision bf16 --mesh_shape data \
    --save_ckpt_freq 1 --save_ckpt_num 3 \
    --output_dir ${OUTPUT_DIR:-~/vit_b_out} --log_freq 100"
