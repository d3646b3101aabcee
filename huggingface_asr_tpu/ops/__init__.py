from huggingface_asr_tpu.ops.features import (
    LogMelConfig,
    LogMelFrontEnd,
    kaldi_mel_filter_bank,
    povey_window,
)
from huggingface_asr_tpu.ops.ctc import ctc_loss, ctc_greedy_decode
from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig, spec_augment
from huggingface_asr_tpu.ops.lengths import conv_output_length, conv_stack_output_length

__all__ = [
    "LogMelConfig",
    "LogMelFrontEnd",
    "kaldi_mel_filter_bank",
    "povey_window",
    "ctc_loss",
    "ctc_greedy_decode",
    "SpecAugmentConfig",
    "spec_augment",
    "conv_output_length",
    "conv_stack_output_length",
]
