#!/usr/bin/env bash
# tedlium E-Branchformer CTC training (reference anchor:
# recipes_v0.0.1/tedlium/train_small*.sh; arg values mirror it).
set -euo pipefail
EXP=${EXP:-exp/tedlium_ctc}

python -m huggingface_asr_tpu.cli.train_ctc \
  --datasets_creation_config recipes/tedlium/datasets.json \
  --preprocessing_config recipes/tedlium/data_preprocessing.json \
  --tokenizer_name "$EXP/tokenizer" \
  --model_config configs/ebranchformer_small_ctc.json \
  --output_dir "$EXP" \
  --per_device_train_batch_size 64 \
  --per_device_eval_batch_size 64 \
  --learning_rate 2e-3 \
  --warmup_steps 15000 \
  --max_steps 150000 \
  --gradient_accumulation_steps 1 \
  --weight_decay 1e-6 \
  --max_grad_norm 1.0 \
  --apply_spec_augment \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --early_stopping_patience 50 \
  --bf16
