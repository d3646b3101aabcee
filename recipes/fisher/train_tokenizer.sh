#!/usr/bin/env bash
# Tokenizer for the fisher recipe (reference anchor:
# recipes_v0.0.1/fisher/train_tokenizer*.sh).
set -euo pipefail
EXP=${EXP:-exp/fisher}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/fisher/datasets.json \
  --tokenizer_type unigram --vocab_size 5000 \
  --tokenizer_output_dir "$EXP/tokenizer"
