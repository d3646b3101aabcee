from huggingface_asr_tpu.utils.metrics import wer, cer, edit_distance

__all__ = ["wer", "cer", "edit_distance"]
