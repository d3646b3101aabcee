#!/usr/bin/env bash
# Tokenizer for the pdtsc_cz recipe (reference anchor:
# recipes_v0.0.1/pdtsc_cz/train_tokenizer*.sh).
set -euo pipefail
EXP=${EXP:-exp/pdtsc_cz}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/pdtsc_cz/datasets.json \
  --tokenizer_type unigram --vocab_size 5000 \
  --tokenizer_output_dir "$EXP/tokenizer"
