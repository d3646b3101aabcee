from huggingface_asr_tpu.decoding.ctc_prefix import (
    CTCPrefixScorer,
    CTCPrefixState,
)
from huggingface_asr_tpu.decoding.beam_search import (
    BeamSearchConfig,
    joint_beam_search,
)

__all__ = [
    "CTCPrefixScorer",
    "CTCPrefixState",
    "BeamSearchConfig",
    "joint_beam_search",
]
