#!/usr/bin/env bash
# Tokenizer for the common_voice_cz recipe (reference anchor:
# recipes_v0.0.1/common_voice_cz/train_tokenizer*.sh).
set -euo pipefail
EXP=${EXP:-exp/common_voice_cz}

python -m huggingface_asr_tpu.cli.train_tokenizer \
  --datasets_creation_config recipes/common_voice_cz/datasets.json \
  --tokenizer_type unigram --vocab_size 500 \
  --tokenizer_output_dir "$EXP/tokenizer"
