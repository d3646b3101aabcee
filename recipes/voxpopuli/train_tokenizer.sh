#!/usr/bin/env bash
# Tokenizer for the voxpopuli recipe (reference anchor:
# recipes_v0.0.1/voxpopuli/train_tokenizer*.sh).
set -euo pipefail
EXP=${EXP:-exp/voxpopuli}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/voxpopuli/datasets.json \
  --tokenizer_type unigram --vocab_size 500 \
  --tokenizer_output_dir "$EXP/tokenizer"
