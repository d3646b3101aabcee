from huggingface_asr_tpu.training.optim import OptimizerConfig, make_optimizer, make_schedule
from huggingface_asr_tpu.training.train_state import AsrTrainState
from huggingface_asr_tpu.training.loop import TrainerConfig, CTCTrainer

__all__ = [
    "OptimizerConfig",
    "make_optimizer",
    "make_schedule",
    "AsrTrainState",
    "TrainerConfig",
    "CTCTrainer",
]
