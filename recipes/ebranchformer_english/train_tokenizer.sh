#!/usr/bin/env bash
# Tokenizer for the ebranchformer_english recipe (reference anchor:
# recipes_v0.0.1/ebranchformer_english/train_tokenizer*.sh).
set -euo pipefail
EXP=${EXP:-exp/ebranchformer_english}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/ebranchformer_english/datasets.json \
  --tokenizer_type unigram --vocab_size 5000 \
  --tokenizer_output_dir "$EXP/tokenizer"
