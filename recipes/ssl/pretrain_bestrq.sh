#!/usr/bin/env bash
# BEST-RQ pretraining of a 30M-class E-Branchformer (reference anchor:
# recipes/librispeech/ssl/30M_ebranchformer): codebook 8192×16, mask 65%/10.
set -euo pipefail
EXP=${EXP:-exp/bestrq_30m}

python -m huggingface_asr_tpu.cli.pretrain \
  --datasets_creation_config recipes/librispeech/librispeech.json \
  --model_config configs/ebranchformer_base_ctc.json \
  --pretraining_objective bestrq \
  --mask_time_prob 0.65 \
  --mask_time_length 10 \
  --output_dir "$EXP" \
  --per_device_train_batch_size 64 \
  --learning_rate 1e-3 \
  --warmup_steps 10000 \
  --max_steps 400000 \
  --bf16
