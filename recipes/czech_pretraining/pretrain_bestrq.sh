#!/usr/bin/env bash
# Czech BEST-RQ pretraining (reference anchor: recipes_v0.0.1/czech_pretraining).
set -euo pipefail
EXP=${EXP:-exp/czech_bestrq}

python -m huggingface_asr_tpu.cli.pretrain \
  --pretraining_objective bestrq \
  --datasets_creation_config recipes/czech_pretraining/datasets.json \
  --output_dir "$EXP" \
  --per_device_train_batch_size 64 \
  --learning_rate 2e-3 \
  --warmup_steps 20000 \
  --max_steps 400000 \
  --max_grad_norm 1.0 \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --bf16
