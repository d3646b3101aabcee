"""AED (DeCRED/ED) training entry point (reference:
src/trainers/train_enc_dec_asr.py).

Joint CTC+attention training with enc/dec loss tracking, periodic beam-search
WER eval, and final joint-decoding evaluation across test splits (optionally
with n-best dumping).
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
    load_fusion_lm,
    load_tokenizer,
    setup_logging,
    split_references,
    tokenizer_ids,
)
from huggingface_asr_tpu.cli.train_ctc import build_trainer_config
from huggingface_asr_tpu.data.bucketing import BucketedBatchSampler, BucketingConfig
from huggingface_asr_tpu.data.prefetch import PrefetchIterator, sharded_device_put
from huggingface_asr_tpu.data.collator import CollatorConfig, SpeechCollator
from huggingface_asr_tpu.data.datasets import DataConfig, get_dataset
from huggingface_asr_tpu.decoding.beam_search import BeamSearchConfig
from huggingface_asr_tpu.decoding.generate import generate_joint
from huggingface_asr_tpu.models.configs import EBranchformerConfig, parse_dtype
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig
from huggingface_asr_tpu.models.joint_ctc_aed import JointCTCAttentionConfig
from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
from huggingface_asr_tpu.training.arguments import (
    GeneralTrainingArguments,
    GenerationArguments,
    ModelArguments,
)
from huggingface_asr_tpu.training.loop import JointTrainer
from huggingface_asr_tpu.training.model_factory import (
    apply_config_overrides,
    instantiate_aed_model,
    load_params,
    save_params,
)
from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser, parse_override_string
from huggingface_asr_tpu.utils.eval_utils import evaluate_splits, get_metrics, save_nbests
from huggingface_asr_tpu.utils.logging_utils import MetricsLogger

logger = logging.getLogger(__name__)


def build_generation_config(gen_args: GenerationArguments, ids) -> BeamSearchConfig:
    return BeamSearchConfig(
        num_beams=max(gen_args.num_beams, 1),
        max_length=gen_args.max_length,
        ctc_weight=gen_args.ctc_weight,
        ctc_margin=gen_args.ctc_margin,
        lm_weight=gen_args.lm_weight,
        length_penalty=gen_args.length_penalty,
        num_candidates=gen_args.num_candidates,
        bos_token_id=ids["bos"],
        eos_token_id=ids["eos"],
        pad_token_id=ids["pad"],
        apply_eos_space_trick=gen_args.apply_eos_space_trick,
        space_token_id=gen_args.space_token_id,
        eos_space_trick_weight=gen_args.eos_space_trick_weight,
    )




def _main_whisper(model_args, training, gen_args, data_cfg):
    """Whisper seq2seq fine-tune path (reference train_enc_dec_asr.py:82-85 +
    handle_whisper_generation_config, model_utils.py:248-261)."""
    import dataclasses as _dc

    from huggingface_asr_tpu.decoding.generate import generate_whisper
    from huggingface_asr_tpu.models.whisper_seq2seq import (
        WhisperForConditionalGeneration,
        WhisperSeq2SeqConfig,
    )
    from huggingface_asr_tpu.training.loop import Seq2SeqTrainer
    from huggingface_asr_tpu.training.model_factory import load_config, load_params

    dataset = get_dataset(data_cfg)
    tokenizer = load_tokenizer(model_args.tokenizer_name)
    ids = tokenizer_ids(tokenizer)

    params = None
    if model_args.from_pretrained:
        config = load_config(model_args.from_pretrained, WhisperSeq2SeqConfig)
        params = load_params(model_args.from_pretrained)
    elif model_args.from_hf_checkpoint:
        import torch

        from huggingface_asr_tpu.interop.hf_whisper import (
            convert_whisper_seq2seq_state_dict,
        )

        from transformers import WhisperConfig

        hf_cfg = WhisperConfig.from_pretrained(model_args.from_hf_checkpoint)
        config = WhisperSeq2SeqConfig.from_hf_config(hf_cfg)
        from transformers import WhisperForConditionalGeneration as HFWhisper

        hf_model = HFWhisper.from_pretrained(model_args.from_hf_checkpoint)
        params = convert_whisper_seq2seq_state_dict(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, config
        )
        del hf_model
    else:
        with open(model_args.model_config) as f:
            raw = json.load(f)
        config = WhisperSeq2SeqConfig(**{
            **raw, "vocab_size": ids["vocab_size"],
            "decoder_start_token_id": ids["bos"],
            "eos_token_id": ids["eos"], "pad_token_id": ids["pad"],
        })
    if model_args.config_overrides:
        overrides = dict(p.split("=", 1) for p in model_args.config_overrides.split(";"))
        config = apply_config_overrides(config, overrides)

    model = WhisperForConditionalGeneration(config, dtype=parse_dtype(model_args.dtype))
    frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=config.num_mel_bins))
    trainer = Seq2SeqTrainer(model, build_trainer_config(training), frontend=frontend)

    collator = SpeechCollator(
        CollatorConfig(
            bucketing=BucketingConfig(
                batch_size=training.per_device_train_batch_size,
                pad_to_multiple=training.pad_to_multiple * 160,
            )
        ),
        tokenizer=tokenizer,
    )
    train_ds = dataset[data_cfg.train_split]
    sampler = BucketedBatchSampler(
        np.asarray(train_ds[data_cfg.length_column_name], dtype=np.float64),
        BucketingConfig(batch_size=training.per_device_train_batch_size, seed=training.seed),
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
    )
    example = collator([train_ds[0]] * 2)
    state = trainer.make_state(params) if params is not None else trainer.init_state(example)
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
            out = jax.device_get(trainer.eval_step(state.params, batch))
            losses.append(float(out["loss"]))
        return {"loss": float(np.mean(losses))}

    train_iter = PrefetchIterator(
        epoch_iterator(train_ds, sampler, collator, max_steps=training.max_steps),
        depth=2,
        device_put=sharded_device_put(trainer.mesh),
    )
    state = trainer.fit(state, train_iter, eval_fn=eval_fn, hooks=[metrics_logger.log])
    trainer.save_checkpoint(state)
    save_params(
        jax.device_get(state.params), os.path.join(training.output_dir, "final"), config
    )

    # Whisper generation-config handling (reference model_utils.py:248-261).
    forced = None
    if model_args.whisper_task and model_args.whisper_language:
        forced = tuple(
            tokenizer.get_decoder_prompt_ids(
                language=model_args.whisper_language, task=model_args.whisper_task
            )
        )
    gen_cfg = BeamSearchConfig(
        num_beams=gen_args.num_beams,
        max_length=gen_args.max_length,
        ctc_weight=0.0,
        length_penalty=gen_args.length_penalty,
        num_candidates=gen_args.num_candidates,
        bos_token_id=config.decoder_start_token_id,
        eos_token_id=config.eos_token_id,
        pad_token_id=config.pad_token_id,
    )
    if gen_args.override_for_evaluation:
        gen_cfg = parse_override_string(gen_args.override_for_evaluation, gen_cfg)

    decode = jax.jit(
        lambda p, feats, lens: generate_whisper(
            model, p, feats, lens, gen_cfg, forced_decoder_ids=forced
        )
    )
    frontend_fn = jax.jit(frontend.__call__)

    def decode_batch(batch):
        feats, lens = frontend_fn(batch["input_values"], batch["input_values_lengths"])
        seqs, _ = jax.device_get(decode(state.params, feats, lens))
        return [
            tokenizer.decode([int(t) for t in row[0]], skip_special_tokens=True)
            for row in seqs
        ], None

    test_splits = {
        name: ds for name, ds in dataset.items()
        if name not in (data_cfg.train_split, data_cfg.validation_split)
    }
    results = evaluate_splits(
        decode_batch,
        {n: eval_batches(ds, collator, training.per_device_eval_batch_size)
         for n, ds in test_splits.items()},
        {n: split_references(ds, data_cfg.text_column_name) for n, ds in test_splits.items()},
        output_dir=training.output_dir,
    )
    metrics_logger.close()
    return results


def main(argv=None):
    parser = DataclassArgumentParser(
        [ModelArguments, GeneralTrainingArguments, GenerationArguments, DataConfig]
    )
    model_args, training, gen_args, data_cfg = parser.parse_args_into_dataclasses(argv)
    setup_logging(training.output_dir)

    if model_args.model_family == "whisper":
        return _main_whisper(model_args, training, gen_args, data_cfg)

    dataset = get_dataset(data_cfg)
    tokenizer = load_tokenizer(model_args.tokenizer_name)
    ids = tokenizer_ids(tokenizer)

    if model_args.model_config:
        with open(model_args.model_config) as f:
            raw = json.load(f)
        enc_cfg = EBranchformerConfig.from_dict(
            {**raw.get("encoder", {}), "vocab_size": ids["vocab_size"]}
        )
        dec_cfg = GPT2DecoderConfig(**{
            **raw.get("decoder", {}),
            "vocab_size": ids["vocab_size"],
            "bos_token_id": ids["bos"],
            "eos_token_id": ids["eos"],
            "pad_token_id": ids["pad"],
            "lsm_factor": model_args.lsm_factor,
            "pos_emb_fixed": model_args.decoder_pos_emb_fixed,
        })
    else:
        enc_cfg = EBranchformerConfig(vocab_size=ids["vocab_size"])
        dec_cfg = GPT2DecoderConfig(
            vocab_size=ids["vocab_size"], bos_token_id=ids["bos"],
            eos_token_id=ids["eos"], pad_token_id=ids["pad"],
            lsm_factor=model_args.lsm_factor,
            pos_emb_fixed=model_args.decoder_pos_emb_fixed,
        )
    config = JointCTCAttentionConfig(
        encoder=enc_cfg,
        decoder=dec_cfg,
        ctc_weight=model_args.ctc_weight,
        shared_lm_head=model_args.shared_lm_head,
        decoder_start_token_id=ids["bos"],
        pad_token_id=ids["pad"],
    )
    if model_args.config_overrides:
        overrides = dict(p.split("=", 1) for p in model_args.config_overrides.split(";"))
        config = apply_config_overrides(config, overrides)

    model, params = instantiate_aed_model(
        config,
        from_pretrained=model_args.from_pretrained,
        dtype=parse_dtype(model_args.dtype),
    )

    frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=config.encoder.num_fbanks))
    trainer = JointTrainer(model, build_trainer_config(training), frontend=frontend)

    collator = SpeechCollator(
        CollatorConfig(
            bucketing=BucketingConfig(
                batch_size=training.per_device_train_batch_size,
                pad_to_multiple=training.pad_to_multiple * 160,
            )
        ),
        tokenizer=tokenizer,
    )
    train_ds = dataset[data_cfg.train_split]
    sampler = BucketedBatchSampler(
        np.asarray(train_ds[data_cfg.length_column_name], dtype=np.float64),
        BucketingConfig(batch_size=training.per_device_train_batch_size, seed=training.seed),
        num_hosts=jax.process_count(),
        host_id=jax.process_index(),
    )

    example = collator([train_ds[0]] * 2)
    state = trainer.make_state(params) if params is not None else trainer.init_state(example)
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
            out = jax.device_get(trainer.eval_step(state.params, batch))
            losses.append(float(out["loss"]))
        return {"loss": float(np.mean(losses))}

    train_iter = PrefetchIterator(
        epoch_iterator(train_ds, sampler, collator, max_steps=training.max_steps),
        depth=2,
        device_put=sharded_device_put(trainer.mesh),
    )
    state = trainer.fit(state, train_iter, eval_fn=eval_fn, hooks=[metrics_logger.log])
    trainer.save_checkpoint(state)
    save_params(
        jax.device_get(state.params), os.path.join(training.output_dir, "final"), config
    )

    # ---- final joint-decoding evaluation
    gen_cfg = build_generation_config(gen_args, ids)
    if gen_args.override_for_evaluation:
        gen_cfg = parse_override_string(gen_args.override_for_evaluation, gen_cfg)
    # Reference do_evaluate: final eval multiplies beams by eval_beam_factor
    # and divides the eval batch by it (general_utils.py:200-203).
    eval_bs = training.per_device_eval_batch_size
    if gen_args.eval_beam_factor > 1:
        import dataclasses as _dc

        gen_cfg = _dc.replace(
            gen_cfg, num_beams=gen_cfg.num_beams * gen_args.eval_beam_factor
        )
        eval_bs = max(eval_bs // gen_args.eval_beam_factor, 1)

    lm_config, lm_params = load_fusion_lm(gen_args)
    decode = jax.jit(
        lambda p, feats, lens: generate_joint(
            model, p, feats, lens, gen_cfg,
            lm_config=lm_config, lm_params=lm_params,
        )
    )
    frontend_fn = jax.jit(frontend.__call__)

    def decode_batch(batch):
        feats, lens = frontend_fn(batch["input_values"], batch["input_values_lengths"])
        seqs, scores = jax.device_get(decode(state.params, feats, lens))
        best = [
            tokenizer.decode([int(t) for t in row[0]], skip_special_tokens=True)
            for row in seqs
        ]
        nbest = [
            [tokenizer.decode([int(t) for t in row[w]], skip_special_tokens=True)
             for w in range(seqs.shape[1])]
            for row in seqs
        ] if gen_args.save_nbest else None
        return best, nbest

    test_splits = {
        name: ds for name, ds in dataset.items()
        if name not in (data_cfg.train_split, data_cfg.validation_split)
    }
    normalizer = None
    if gen_args.post_process_predictions:
        from huggingface_asr_tpu.utils.normalizer import EnglishNormalizer

        normalizer = EnglishNormalizer()
    results = evaluate_splits(
        decode_batch,
        {n: eval_batches(ds, collator, eval_bs) for n, ds in test_splits.items()},
        {n: split_references(ds, data_cfg.text_column_name) for n, ds in test_splits.items()},
        output_dir=training.output_dir,
        normalizer=normalizer,
    )
    metrics_logger.close()
    return results


if __name__ == "__main__":
    main()
