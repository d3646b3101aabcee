"""CTC ASR training entry point (reference: src/trainers/train_ctc_asr.py).

Flow: parse arg groups → get_dataset → tokenizer → model →
bucketed batches of raw waveforms → compiled train step (on-device log-mel +
SpecAugment + E-Branchformer + fp32 CTC) over the data mesh → periodic
greedy-WER eval → checkpoints → final per-test-split evaluation.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.cli.common import (
    epoch_iterator,
    eval_batches,
    load_tokenizer,
    setup_logging,
    split_references,
    tokenizer_ids,
)
from huggingface_asr_tpu.data.bucketing import BucketedBatchSampler, BucketingConfig
from huggingface_asr_tpu.data.prefetch import PrefetchIterator, sharded_device_put
from huggingface_asr_tpu.data.collator import CollatorConfig, SpeechCollator
from huggingface_asr_tpu.data.datasets import DataConfig, get_dataset
from huggingface_asr_tpu.models.configs import EBranchformerConfig, parse_dtype
from huggingface_asr_tpu.ops.ctc import tokens_to_lists
from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig
from huggingface_asr_tpu.parallel.mesh import MeshConfig
from huggingface_asr_tpu.training.arguments import (
    GeneralTrainingArguments,
    GenerationArguments,
    ModelArguments,
)
from huggingface_asr_tpu.training.loop import CTCTrainer, TrainerConfig
from huggingface_asr_tpu.training.model_factory import (
    apply_config_overrides,
    instantiate_ctc_model,
    load_params,
    save_params,
)
from huggingface_asr_tpu.training.optim import OptimizerConfig
from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser
from huggingface_asr_tpu.utils.eval_utils import evaluate_splits, get_metrics
from huggingface_asr_tpu.utils.logging_utils import MetricsLogger

logger = logging.getLogger(__name__)


def build_trainer_config(training: GeneralTrainingArguments) -> TrainerConfig:
    return TrainerConfig(
        optimizer=OptimizerConfig(
            learning_rate=training.learning_rate,
            lr_scheduler_type=training.lr_scheduler_type,
            warmup_steps=training.warmup_steps,
            total_steps=training.max_steps,
            weight_decay=training.weight_decay,
            adam_beta1=training.adam_beta1,
            adam_beta2=training.adam_beta2,
            adam_epsilon=training.adam_epsilon,
            max_grad_norm=training.max_grad_norm,
            gradient_accumulation_steps=training.gradient_accumulation_steps,
        ),
        mesh=MeshConfig(fsdp=training.fsdp),
        spec_augment=SpecAugmentConfig() if training.apply_spec_augment else None,
        log_every=training.logging_steps,
        eval_every=training.eval_steps,
        save_every=training.save_steps,
        max_steps=training.max_steps,
        seed=training.seed,
        checkpoint_dir=os.path.join(os.path.abspath(training.output_dir), "checkpoints"),
        keep_checkpoints=training.save_total_limit,
        early_stopping_patience=training.early_stopping_patience,
        greater_is_better=training.greater_is_better,
        metric_for_best=training.metric_for_best_model,
    )


def main(argv=None):
    parser = DataclassArgumentParser(
        [ModelArguments, GeneralTrainingArguments, GenerationArguments, DataConfig]
    )
    model_args, training, gen_args, data_cfg = parser.parse_args_into_dataclasses(argv)
    setup_logging(training.output_dir)

    dataset = get_dataset(data_cfg)
    if training.preprocess_dataset_only:
        return

    tokenizer = load_tokenizer(model_args.tokenizer_name)
    ids = tokenizer_ids(tokenizer)

    dtype = parse_dtype(model_args.dtype)
    family = model_args.model_family
    encoder_init = None
    trainer_cls = CTCTrainer
    if family == "whisper_ctc":
        # Whisper-encoder CTC (reference trains it through its CTC trainer
        # with recipe-local imports, recipes_v0.0.1/librispeech_whisper_ctc/
        # whisper_ctc.py:120-251).
        from huggingface_asr_tpu.models.whisper_ctc import (
            WhisperCTCConfig,
            WhisperEncoderForCTC,
        )
        from huggingface_asr_tpu.training.model_factory import load_config

        if model_args.model_config:
            with open(model_args.model_config) as f:
                config = WhisperCTCConfig(**json.load(f))
        elif model_args.from_pretrained:
            config = load_config(model_args.from_pretrained, WhisperCTCConfig)
        else:
            config = WhisperCTCConfig()
        config = dataclasses.replace(config, vocab_size=ids["vocab_size"])
        if model_args.config_overrides:
            overrides = dict(p.split("=", 1) for p in model_args.config_overrides.split(";"))
            config = apply_config_overrides(config, overrides)
        model = WhisperEncoderForCTC(config, dtype=dtype)
        params = (
            load_params(model_args.from_pretrained)
            if model_args.from_pretrained else None
        )
        num_mel = config.num_mel_bins
    elif family == "llm_asr":
        # Whisper-CTC encoder soft-prompting a causal LLM (reference
        # local_models.py:10-243).
        from huggingface_asr_tpu.models.llm_asr import LLMASRConfig, LLMASRModel
        from huggingface_asr_tpu.training.loop import LLMASRTrainer
        from huggingface_asr_tpu.training.model_factory import load_config

        if model_args.model_config:
            from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig
            from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig

            with open(model_args.model_config) as f:
                d = json.load(f)
            config = LLMASRConfig(
                encoder=WhisperCTCConfig(**d.get("encoder", {})),
                decoder=GPT2DecoderConfig(**{
                    k: tuple(v) if isinstance(v, list) else v
                    for k, v in d.get("decoder", {}).items()
                }),
                **{k: v for k, v in d.items() if k not in ("encoder", "decoder")},
            )
        elif model_args.from_pretrained:
            config = load_config(model_args.from_pretrained, LLMASRConfig)
        else:
            config = LLMASRConfig()
        # Encoder and LLM share the CLI tokenizer's vocab (the reference's
        # vocab-subset head makes the same identification).
        config = dataclasses.replace(
            config,
            encoder=dataclasses.replace(config.encoder, vocab_size=ids["vocab_size"]),
            decoder=dataclasses.replace(
                config.decoder, vocab_size=ids["vocab_size"],
                bos_token_id=ids["bos"], eos_token_id=ids["eos"],
                pad_token_id=ids["pad"],
            ),
        )
        model = LLMASRModel(config, dtype=dtype)
        params = (
            load_params(model_args.from_pretrained)
            if model_args.from_pretrained else None
        )
        trainer_cls = LLMASRTrainer
        num_mel = config.encoder.num_mel_bins
    else:
        if model_args.model_config:
            with open(model_args.model_config) as f:
                config = EBranchformerConfig.from_dict(json.load(f))
            config = dataclasses.replace(config, vocab_size=ids["vocab_size"])
        elif model_args.from_pretrained:
            # architecture from the checkpoint (possibly an SSL pretrain one),
            # vocab from the fine-tune tokenizer
            from huggingface_asr_tpu.training.model_factory import load_config

            config = load_config(model_args.from_pretrained, EBranchformerConfig)
            config = dataclasses.replace(config, vocab_size=ids["vocab_size"])
        else:
            config = EBranchformerConfig(vocab_size=ids["vocab_size"])
        if model_args.config_overrides:
            overrides = dict(p.split("=", 1) for p in model_args.config_overrides.split(";"))
            config = apply_config_overrides(config, overrides)

        model, params = instantiate_ctc_model(
            config,
            from_pretrained=model_args.from_pretrained,
            from_hf_checkpoint=model_args.from_hf_checkpoint,
            dtype=dtype,
        )
        # SSL (pretrain.py) checkpoint: encoder-only initialization — fresh CTC
        # head over the pretrained encoder (reference fine-tune flow,
        # bestrq.py:191-322 / pretrain.py:21-88).
        if params is not None and "lm_head" not in params:
            encoder_init = params["wav2vec2"]
            params = None
        num_mel = config.num_fbanks

    frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=num_mel))
    trainer_cfg = build_trainer_config(training)

    speed_perturb = None
    if training.preprocessing_config:
        import dataclasses as _dc

        from huggingface_asr_tpu.data.preprocessing_config import (
            load_preprocessing_config,
        )

        plan = load_preprocessing_config(training.preprocessing_config, training.seed)
        speed_perturb = plan.audio_transform
        if plan.spec_augment is not None:
            trainer_cfg = _dc.replace(
                trainer_cfg,
                spec_augment=plan.spec_augment,
                spec_augment_start_step=plan.spec_augment_start_step,
            )
    trainer = trainer_cls(model, trainer_cfg, frontend=frontend)

    collator_cfg = CollatorConfig(
        bucketing=BucketingConfig(
            batch_size=training.per_device_train_batch_size,
            pad_to_multiple=training.pad_to_multiple * 160,  # frames → samples
        )
    )
    train_collator = SpeechCollator(
        collator_cfg, tokenizer=tokenizer, audio_transform=speed_perturb
    )
    collator = SpeechCollator(collator_cfg, tokenizer=tokenizer)  # eval: no augment
    train_ds = dataset[data_cfg.train_split]
    sampler = BucketedBatchSampler(
        np.asarray(train_ds[data_cfg.length_column_name], dtype=np.float64),
        BucketingConfig(
            batch_size=training.per_device_train_batch_size,
            seed=training.seed,
        ),
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
    )

    example = collator([train_ds[0]] * 2)
    if params is not None:
        state = trainer.make_state(params)
    else:
        state = trainer.init_state(example)
        if encoder_init is not None:
            merged = dict(state.params)
            merged["wav2vec2"] = jax.tree.map(
                lambda s, p: jnp.asarray(p, s.dtype), state.params["wav2vec2"],
                encoder_init,
            )
            state = trainer.make_state(merged)
    if training.restart_from:
        state = trainer.restore_checkpoint(state, None)
    if hasattr(speed_perturb, "set_step"):
        # delayed-start transforms resume from the restored global step
        speed_perturb.set_step(int(state.step))

    metrics_logger = MetricsLogger(training.output_dir, use_wandb=training.report_to_wandb)

    def eval_fn(state):
        val = dataset.get(data_cfg.validation_split)
        if val is None:
            return {}
        refs, hyps, losses = [], [], []
        for batch in eval_batches(val, collator, training.per_device_eval_batch_size):
            num_real = int(batch.pop("_num_real"))
            out = jax.device_get(trainer.eval_step(state.params, batch))
            losses.append(float(out["loss"]))
            toks = tokens_to_lists(out["tokens"], out["token_lengths"])[:num_real]
            hyps.extend(tokenizer.decode(t, skip_special_tokens=True) for t in toks)
        refs = split_references(val, data_cfg.text_column_name)
        assert len(refs) == len(hyps), (len(refs), len(hyps))
        m = get_metrics(refs, hyps)
        return {"loss": float(np.mean(losses)), **m}

    if training.start_by_eval:
        logger.info("start_by_eval: %s", eval_fn(state))

    train_iter = PrefetchIterator(
        epoch_iterator(train_ds, sampler, train_collator, max_steps=training.max_steps),
        depth=2,
        device_put=sharded_device_put(trainer.mesh),
    )
    state = trainer.fit(
        state, train_iter, eval_fn=eval_fn, hooks=[metrics_logger.log]
    )
    trainer.save_checkpoint(state)
    save_params(
        jax.device_get(state.params), os.path.join(training.output_dir, "final"), config
    )

    # Final evaluation on all test splits.
    test_splits = {
        name: ds for name, ds in dataset.items()
        if name not in (data_cfg.train_split, data_cfg.validation_split)
    }

    def decode_batch(batch):
        out = jax.device_get(trainer.eval_step(state.params, batch))
        toks = tokens_to_lists(out["tokens"], out["token_lengths"])
        return [tokenizer.decode(t, skip_special_tokens=True) for t in toks], None

    results = evaluate_splits(
        decode_batch,
        {
            name: eval_batches(ds, collator, training.per_device_eval_batch_size)
            for name, ds in test_splits.items()
        },
        {name: split_references(ds, data_cfg.text_column_name) for name, ds in test_splits.items()},
        output_dir=training.output_dir,
    )
    metrics_logger.close()
    return results


if __name__ == "__main__":
    main()
