#!/usr/bin/env bash
# Whisper-encoder CTC fine-tune (reference anchor:
# recipes_v0.0.1/librispeech_whisper_ctc/*.sh).
set -euo pipefail
EXP=${EXP:-exp/librispeech_whisper_ctc}

python -m huggingface_asr_tpu.cli.train_ctc \
  --datasets_creation_config recipes/librispeech_whisper_ctc/datasets.json \
  --tokenizer_name "$EXP/tokenizer" \
  --from_hf_checkpoint openai/whisper-small.en \
  --output_dir "$EXP" \
  --per_device_train_batch_size 32 \
  --learning_rate 2e-4 \
  --warmup_steps 5000 \
  --max_steps 50000 \
  --max_grad_norm 1.0 \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --bf16
