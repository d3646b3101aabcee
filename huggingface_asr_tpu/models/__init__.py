from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import (
    EBranchformerForCTC,
    EBranchformerModel,
    feat_extract_output_frames,
    feat_extract_output_lengths,
)

__all__ = [
    "EBranchformerConfig",
    "EBranchformerForCTC",
    "EBranchformerModel",
    "feat_extract_output_frames",
    "feat_extract_output_lengths",
]
