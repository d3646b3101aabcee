from huggingface_asr_tpu.data.text_transforms import (
    TEXT_TRANSFORMS,
    TEXT_FILTERS,
    apply_text_transforms,
)
from huggingface_asr_tpu.data.bucketing import (
    BucketingConfig,
    BucketedBatchSampler,
    quantize_length,
)
from huggingface_asr_tpu.data.collator import SpeechCollator, CollatorConfig

__all__ = [
    "TEXT_TRANSFORMS",
    "TEXT_FILTERS",
    "apply_text_transforms",
    "BucketingConfig",
    "BucketedBatchSampler",
    "quantize_length",
    "SpeechCollator",
    "CollatorConfig",
]
