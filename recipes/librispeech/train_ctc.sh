#!/usr/bin/env bash
# LibriSpeech-960 E-Branchformer CTC (reproduction anchor: reference
# recipes/librispeech/train_ctc.sh — bs 64/device, lr 2e-3, 5k warmup,
# pad-to-×100 mel frames, ≤20 s utterances). TPU: one process per host,
# jax.distributed auto-initializes from the TPU environment.
set -euo pipefail
EXP=${EXP:-exp/librispeech_ctc_base}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/librispeech/librispeech.json \
  --tokenizer_type unigram --vocab_size 500 \
  --tokenizer_output_dir "$EXP/tokenizer"

python -m huggingface_asr_tpu.cli.train_ctc \
  --datasets_creation_config recipes/librispeech/librispeech.json \
  --tokenizer_name "$EXP/tokenizer" \
  --model_config configs/ebranchformer_base_ctc.json \
  --output_dir "$EXP" \
  --per_device_train_batch_size 64 \
  --per_device_eval_batch_size 64 \
  --learning_rate 2e-3 \
  --warmup_steps 5000 \
  --max_steps 300000 \
  --weight_decay 1e-6 \
  --max_grad_norm 5.0 \
  --apply_spec_augment \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --early_stopping_patience 10 \
  --bf16
