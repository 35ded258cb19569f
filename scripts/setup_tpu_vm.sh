#!/usr/bin/env bash
# TPU-VM provisioning cookbook. Parity with reference run_commands.sh:1-120
# (clone, venv, deps, device probe) for the JAX stack.
set -euo pipefail

REPO_URL=${REPO_URL:-https://github.com/your-org/vision_transformers_torch_xla_tpu}

sudo apt-get update -qq && sudo apt-get install -y -qq python3-venv build-essential libjpeg-dev

git clone "$REPO_URL" ~/vtx && cd ~/vtx
python3 -m venv ~/.venv-vtx && source ~/.venv-vtx/bin/activate
pip install -U pip
pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install flax optax orbax-checkpoint chex einops numpy pillow pytest
pip install tensorflow-cpu tensorflow-datasets   # TFDS input path (optional)

# native IO runtime
make -C native

# device probe (parity with reference run_commands.sh:28-32)
python - <<'EOF'
import jax
print("devices:", jax.devices())
print("process", jax.process_index(), "of", jax.process_count())
EOF

# quick smoke: 4 synthetic steps
python -m vision_transformers_torch_xla_tpu.launch.main \
  --model my_vit_ti --data_set synthetic --batch_size 16 \
  --epochs 1 --limit_steps_per_epoch 4 --limit_eval_batches 1 \
  --output_dir /tmp/vtx_smoke
