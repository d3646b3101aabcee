#!/usr/bin/env bash
# DeCRED base joint CTC+attention training (reproduction anchor: reference
# recipes_v0.0.1/decred — ctc_weight 0.3, label smoothing 0.1, lr 2e-3,
# 10k warmup; released decode defaults: beams 5, decoding ctc_weight 0.3).
set -euo pipefail
EXP=${EXP:-exp/decred_base}
CORPORA=${CORPORA:-recipes/librispeech/librispeech.json}

python -m huggingface_asr_tpu.cli.train_aed \
  --datasets_creation_config "$CORPORA" \
  --tokenizer_name "$EXP/tokenizer" \
  --model_config configs/decred_base.json \
  --output_dir "$EXP" \
  --ctc_weight 0.3 \
  --lsm_factor 0.1 \
  --per_device_train_batch_size 128 \
  --learning_rate 2e-3 \
  --warmup_steps 10000 \
  --max_steps 200000 \
  --apply_spec_augment \
  --pad_to_multiple 100 \
  --num_beams 5 \
  --max_length 512 \
  --override_for_evaluation "ctc_weight=0.3;num_beams=5" \
  --bf16
