#!/usr/bin/env bash
# fisher DeCRED/ED joint CTC-attention training (reference anchor:
# recipes_v0.0.1/decred + librispeech_aed arg values).
set -euo pipefail
EXP=${EXP:-exp/fisher_aed}

python -m huggingface_asr_tpu.cli.train_aed \
  --datasets_creation_config recipes/fisher/datasets.json \
  --preprocessing_config recipes/fisher/data_preprocessing.json \
  --tokenizer_name "$EXP/tokenizer" \
  --model_config configs/decred_small.json \
  --output_dir "$EXP" \
  --per_device_train_batch_size 64 \
  --per_device_eval_batch_size 64 \
  --learning_rate 2e-3 \
  --warmup_steps 15000 \
  --max_steps 150000 \
  --weight_decay 1e-6 \
  --max_grad_norm 1.0 \
  --ctc_weight 0.3 \
  --lsm_factor 0.1 \
  --num_beams 5 \
  --max_length 512 \
  --override_for_evaluation "ctc_weight=0.3;num_beams=5" \
  --apply_spec_augment \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --early_stopping_patience 50 \
  --bf16
