#!/usr/bin/env bash
# Standalone decode of a trained ebranchformer_english checkpoint (reference anchor:
# recipes_v0.0.1/ebranchformer_english/decoding/ or decode_with_*.sh).
set -euo pipefail
EXP=${EXP:-exp/ebranchformer_english_ctc}

python -m huggingface_asr_tpu.cli.evaluate \
  --datasets_creation_config recipes/ebranchformer_english/datasets.json \
  --tokenizer_name "$EXP/tokenizer" \
  --from_pretrained "$EXP/final" \
  --model_type ctc \
  --output_dir "$EXP/eval" \
  --batch_size 32 \
  --post_process_predictions
