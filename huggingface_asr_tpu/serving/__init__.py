from huggingface_asr_tpu.serving.pipeline import ASRPipeline, EndpointHandler

__all__ = ["ASRPipeline", "EndpointHandler"]
