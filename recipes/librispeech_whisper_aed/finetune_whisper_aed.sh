#!/usr/bin/env bash
# Whisper seq2seq fine-tune (reference: train_enc_dec_asr.py whisper path).
set -euo pipefail
EXP=${EXP:-exp/librispeech_whisper_aed}

python -m huggingface_asr_tpu.cli.train_aed \
  --model_family whisper \
  --datasets_creation_config recipes/librispeech_whisper_aed/datasets.json \
  --tokenizer_name openai/whisper-small.en \
  --from_hf_checkpoint openai/whisper-small.en \
  --whisper_task transcribe --whisper_language en \
  --output_dir "$EXP" \
  --per_device_train_batch_size 32 \
  --learning_rate 1e-5 \
  --warmup_steps 2000 \
  --max_steps 40000 \
  --max_grad_norm 1.0 \
  --num_beams 5 \
  --max_length 448 \
  --pad_to_multiple 100 \
  --max_duration_in_seconds 20 \
  --bf16
