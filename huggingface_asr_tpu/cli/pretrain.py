"""SSL pretraining entry point (reference: src/trainers/pretrain.py).

BEST-RQ or wav2vec2-contrastive pretraining of the E-Branchformer encoder.
Mask spans (and, for wav2vec2, negative indices) are sampled host-side per
batch (reference collators.py:109-253); featurization and the objective run
inside the compiled step.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os

import jax
import numpy as np

from huggingface_asr_tpu.cli.common import (
    epoch_iterator,
    eval_batches,
    setup_logging,
)
from huggingface_asr_tpu.cli.train_ctc import build_trainer_config
from huggingface_asr_tpu.data.bucketing import BucketedBatchSampler, BucketingConfig
from huggingface_asr_tpu.data.prefetch import PrefetchIterator, sharded_device_put
from huggingface_asr_tpu.data.collator import CollatorConfig, SpeechCollator
from huggingface_asr_tpu.data.datasets import DataConfig, get_dataset
from huggingface_asr_tpu.models.bestrq import BestRQForPreTraining
from huggingface_asr_tpu.models.configs import EBranchformerConfig, parse_dtype
from huggingface_asr_tpu.models.ebranchformer import (
    feat_extract_output_frames,
    feat_extract_output_lengths,
)
from huggingface_asr_tpu.models.wav2vec2_ssl import Wav2Vec2ForPreTraining
from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
from huggingface_asr_tpu.ops.masking import compute_mask_indices, sample_negative_indices
from huggingface_asr_tpu.training.arguments import (
    GeneralTrainingArguments,
    ModelArguments,
    PretrainingArguments,
)
from huggingface_asr_tpu.training.loop import BestRQTrainer, Wav2Vec2SSLTrainer
from huggingface_asr_tpu.training.model_factory import save_params
from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser
from huggingface_asr_tpu.utils.logging_utils import MetricsLogger

logger = logging.getLogger(__name__)


def make_ssl_batch_fn(config: EBranchformerConfig, pretrain_args, frontend_cfg,
                      seed: int = 0):
    """Augment collated batches with mask (and negatives) over encoder frames."""
    rng = np.random.default_rng(seed)
    is_w2v2 = pretrain_args.pretraining_objective == "wav2vec2"

    def fn(batch):
        wav_lens = batch["input_values_lengths"]
        mel_lens = frontend_cfg.num_frames(wav_lens)
        enc_lens = np.asarray(feat_extract_output_lengths(config, mel_lens))
        S = batch["input_values"].shape[1]
        T_enc = int(feat_extract_output_frames(config, int(frontend_cfg.num_frames(S))))
        mask = compute_mask_indices(
            (len(wav_lens), T_enc),
            pretrain_args.mask_time_prob,
            pretrain_args.mask_time_length,
            lengths=enc_lens,
            min_masks=pretrain_args.min_masks,
            rng=rng,
        )
        batch["mask_time_indices"] = mask
        if is_w2v2:
            batch["sampled_negative_indices"] = sample_negative_indices(
                mask, config.num_negatives, rng=rng
            )
        return batch

    return fn


def main(argv=None):
    parser = DataclassArgumentParser(
        [ModelArguments, GeneralTrainingArguments, PretrainingArguments, DataConfig]
    )
    model_args, training, pretrain_args, data_cfg = parser.parse_args_into_dataclasses(argv)
    setup_logging(training.output_dir)

    dataset = get_dataset(data_cfg)

    if model_args.model_config:
        with open(model_args.model_config) as f:
            config = EBranchformerConfig.from_dict(json.load(f))
    else:
        config = EBranchformerConfig()

    dtype = parse_dtype(model_args.dtype)
    is_w2v2 = pretrain_args.pretraining_objective == "wav2vec2"
    model = (
        Wav2Vec2ForPreTraining(config, dtype=dtype)
        if is_w2v2
        else BestRQForPreTraining(config, dtype=dtype)
    )

    frontend_cfg = LogMelConfig(num_mel_bins=config.num_fbanks)
    frontend = LogMelFrontEnd(frontend_cfg)
    trainer_cls = Wav2Vec2SSLTrainer if is_w2v2 else BestRQTrainer
    tcfg = build_trainer_config(training)
    tcfg = dataclasses.replace(
        tcfg,
        spec_augment=None,
        gumbel_temperature_start=pretrain_args.gumbel_temperature_start,
        gumbel_temperature_end=pretrain_args.gumbel_temperature_end,
        gumbel_temperature_decay=pretrain_args.gumbel_temperature_decay,
    )
    trainer = trainer_cls(model, tcfg, frontend=frontend)

    collator = SpeechCollator(
        CollatorConfig(
            bucketing=BucketingConfig(
                batch_size=training.per_device_train_batch_size,
                pad_to_multiple=training.pad_to_multiple * 160,
            )
        )
    )
    batch_fn = make_ssl_batch_fn(config, pretrain_args, frontend_cfg, training.seed)

    train_ds = dataset[data_cfg.train_split]
    sampler = BucketedBatchSampler(
        np.asarray(train_ds[data_cfg.length_column_name], dtype=np.float64),
        BucketingConfig(batch_size=training.per_device_train_batch_size, seed=training.seed),
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
    )

    example = batch_fn(collator([train_ds[0]] * 2))
    state = trainer.init_state(example)
    if training.restart_from:
        state = trainer.restore_checkpoint(state, None)

    metrics_logger = MetricsLogger(training.output_dir, use_wandb=training.report_to_wandb)

    def eval_fn(state):
        val = dataset.get(data_cfg.validation_split)
        if val is None:
            return {}
        losses = []
        for batch in eval_batches(val, collator, training.per_device_eval_batch_size):
            batch.pop("_num_real", None)
            out = jax.device_get(trainer.eval_step(state.params, batch_fn(batch)))
            losses.append(float(out["loss"]))
        return {"loss": float(np.mean(losses))}

    train_iter = PrefetchIterator(
        epoch_iterator(
            train_ds, sampler, collator, max_steps=training.max_steps, extra_fn=batch_fn
        ),
        depth=2,
        device_put=sharded_device_put(trainer.mesh),
    )
    state = trainer.fit(state, train_iter, eval_fn=eval_fn, hooks=[metrics_logger.log])
    trainer.save_checkpoint(state)
    save_params(
        jax.device_get(state.params), os.path.join(training.output_dir, "final"), config
    )
    metrics_logger.close()


if __name__ == "__main__":
    main()
