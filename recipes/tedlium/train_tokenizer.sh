#!/usr/bin/env bash
# Tokenizer for the tedlium recipe (reference anchor:
# recipes_v0.0.1/tedlium/train_tokenizer*.sh).
set -euo pipefail
EXP=${EXP:-exp/tedlium}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/tedlium/datasets.json \
  --tokenizer_type unigram --vocab_size 500 \
  --tokenizer_output_dir "$EXP/tokenizer"
