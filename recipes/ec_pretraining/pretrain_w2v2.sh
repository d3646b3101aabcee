#!/usr/bin/env bash
# Wav2Vec2 contrastive pretraining (reference anchor: recipes_v0.0.1/ec_pretraining).
set -euo pipefail
EXP=${EXP:-exp/ec_w2v2}

python -m huggingface_asr_tpu.cli.pretrain \
  --pretraining_objective wav2vec2 \
  --datasets_creation_config recipes/ec_pretraining/datasets.json \
  --output_dir "$EXP" \
  --per_device_train_batch_size 64 \
  --learning_rate 5e-4 \
  --warmup_steps 32000 \
  --max_steps 400000 \
  --max_grad_norm 1.0 \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --bf16
