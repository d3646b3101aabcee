from huggingface_asr_tpu.interop.hf_ebranchformer import (
    convert_ebranchformer_ctc_state_dict,
    load_hf_ctc_checkpoint,
)

__all__ = ["convert_ebranchformer_ctc_state_dict", "load_hf_ctc_checkpoint"]
