"""Standalone decode/evaluation entry point.

Covers the reference's eval paths — ``do_evaluate`` with generation-config
override strings and per-split CSV/trn outputs (reference:
src/utilities/general_utils.py:129-228) and the baseline-decoder CLI shape of
``decode_with_espnet_model.py`` — for our checkpoints: CTC greedy decode for
encoder-only models, joint CTC/attention beam search for AED models.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import numpy as np

from huggingface_asr_tpu.cli.common import (
    eval_batches,
    load_fusion_lm,
    load_tokenizer,
    setup_logging,
    split_references,
    tokenizer_ids,
)
from huggingface_asr_tpu.cli.train_aed import build_generation_config
from huggingface_asr_tpu.data.bucketing import BucketingConfig
from huggingface_asr_tpu.data.collator import CollatorConfig, SpeechCollator
from huggingface_asr_tpu.data.datasets import DataConfig, get_dataset
from huggingface_asr_tpu.decoding.generate import generate_joint
from huggingface_asr_tpu.models.configs import EBranchformerConfig, parse_dtype
from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
from huggingface_asr_tpu.models.joint_ctc_aed import (
    JointCTCAttentionConfig,
    JointCTCAttentionEncoderDecoder,
)
from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode, tokens_to_lists
from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
from huggingface_asr_tpu.training.arguments import GenerationArguments, ModelArguments
from huggingface_asr_tpu.training.model_factory import load_config, load_params
from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser, parse_override_string
from huggingface_asr_tpu.utils.eval_utils import evaluate_splits, save_nbests

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class EvalArguments:
    output_dir: str = "eval_output"
    batch_size: int = 32
    model_type: str = "ctc"  # ctc | aed | whisper_ctc | llm_asr
    # "auto": serving Pallas encoder when on TPU and the config/dtype
    # qualify; "on": require it; "off": force the XLA encoder (exact
    # decode-parity op order). Mirrors generate_joint's fused_encoder gate.
    fused_encoder: str = "auto"  # auto | on | off


def main(argv=None):
    parser = DataclassArgumentParser(
        [EvalArguments, ModelArguments, GenerationArguments, DataConfig]
    )
    eval_args, model_args, gen_args, data_cfg = parser.parse_args_into_dataclasses(argv)
    setup_logging(eval_args.output_dir)

    dataset = get_dataset(data_cfg)
    tokenizer = load_tokenizer(model_args.tokenizer_name)
    ids = tokenizer_ids(tokenizer)
    dtype = parse_dtype(model_args.dtype)

    if eval_args.model_type == "ctc":
        config = load_config(model_args.from_pretrained, EBranchformerConfig)
        params = load_params(model_args.from_pretrained)
        model = EBranchformerForCTC(config, dtype=dtype)
        frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=config.num_fbanks))

        from huggingface_asr_tpu.models.fast_infer import (
            ctc_infer_fused,
            fused_encoder_ok,
        )

        ok = fused_encoder_ok(config, dtype) and jax.default_backend() == "tpu"
        if eval_args.fused_encoder == "on" and not ok:
            raise ValueError(
                "--fused_encoder on, but the encoder config/dtype/backend is "
                "outside the fused kernel's support (needs TPU, relative "
                "positions, non-causal, macaron FF, bfloat16, no adapters)"
            )
        use_fused = eval_args.fused_encoder != "off" and ok
        if use_fused:
            logger.info("CTC decode through the fused serving encoder")

            @jax.jit
            def decode_fn(feats, lens):
                bb = max(d for d in (8, 4, 2, 1) if feats.shape[0] % d == 0)
                out = ctc_infer_fused(params, config, feats, lens, bb=bb)
                return ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)

        else:

            @jax.jit
            def decode_fn(feats, lens):
                out = model.apply({"params": params}, feats, lens, deterministic=True)
                return ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)

        frontend_fn = jax.jit(frontend.__call__)

        def decode_batch(batch):
            feats, lens = frontend_fn(batch["input_values"], batch["input_values_lengths"])
            toks, tlens = jax.device_get(decode_fn(feats, lens))
            return [
                tokenizer.decode(t, skip_special_tokens=True)
                for t in tokens_to_lists(toks, tlens)
            ], None

    elif eval_args.model_type == "whisper_ctc":
        from huggingface_asr_tpu.models.whisper_ctc import (
            WhisperCTCConfig,
            WhisperEncoderForCTC,
        )

        config = load_config(model_args.from_pretrained, WhisperCTCConfig)
        params = load_params(model_args.from_pretrained)
        model = WhisperEncoderForCTC(config, dtype=dtype)
        frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=config.num_mel_bins))

        @jax.jit
        def decode_fn(feats, lens):
            out = model.apply({"params": params}, feats, lens, deterministic=True)
            return ctc_greedy_decode(
                out.logits, out.logit_lengths, blank_id=config.blank_token_id
            )

        frontend_fn = jax.jit(frontend.__call__)

        def decode_batch(batch):
            feats, lens = frontend_fn(batch["input_values"], batch["input_values_lengths"])
            toks, tlens = jax.device_get(decode_fn(feats, lens))
            return [
                tokenizer.decode(t, skip_special_tokens=True)
                for t in tokens_to_lists(toks, tlens)
            ], None

    elif eval_args.model_type == "llm_asr":
        from huggingface_asr_tpu.models.llm_asr import (
            LLMASRConfig,
            LLMASRModel,
            llm_asr_greedy_decode,
        )

        config = load_config(model_args.from_pretrained, LLMASRConfig)
        params = load_params(model_args.from_pretrained)
        model = LLMASRModel(config, dtype=dtype)
        frontend = LogMelFrontEnd(
            LogMelConfig(num_mel_bins=config.encoder.num_mel_bins)
        )
        max_len = gen_args.max_length

        @jax.jit
        def decode_fn(feats, lens):
            return llm_asr_greedy_decode(model, params, feats, lens, max_len=max_len)

        frontend_fn = jax.jit(frontend.__call__)

        def decode_batch(batch):
            feats, lens = frontend_fn(batch["input_values"], batch["input_values_lengths"])
            toks, tlens = jax.device_get(decode_fn(feats, lens))
            return [
                tokenizer.decode(t, skip_special_tokens=True)
                for t in tokens_to_lists(toks, tlens)
            ], None

    else:
        config = load_config(model_args.from_pretrained, JointCTCAttentionConfig)
        params = load_params(model_args.from_pretrained)
        model = JointCTCAttentionEncoderDecoder(config, dtype=dtype)
        frontend = LogMelFrontEnd(LogMelConfig(num_mel_bins=config.encoder.num_fbanks))
        gen_cfg = build_generation_config(gen_args, ids)
        if gen_args.override_for_evaluation:
            gen_cfg = parse_override_string(gen_args.override_for_evaluation, gen_cfg)
        if gen_args.save_nbest:
            gen_cfg = dataclasses.replace(gen_cfg, return_components=True)
        if gen_args.eval_beam_factor > 1:
            # Reference do_evaluate: beams x= factor, eval batch /= factor
            # (general_utils.py:200-203).
            gen_cfg = dataclasses.replace(
                gen_cfg, num_beams=gen_cfg.num_beams * gen_args.eval_beam_factor
            )
            eval_args = dataclasses.replace(
                eval_args,
                batch_size=max(eval_args.batch_size // gen_args.eval_beam_factor, 1),
            )

        lm_config, lm_params = load_fusion_lm(gen_args)
        decode_jit = jax.jit(
            lambda feats, lens: generate_joint(
                model, params, feats, lens, gen_cfg,
                lm_config=lm_config, lm_params=lm_params,
            )
        )
        frontend_fn = jax.jit(frontend.__call__)
        nbest_store = []

        def decode_batch(batch):
            feats, lens = frontend_fn(batch["input_values"], batch["input_values_lengths"])
            out = jax.device_get(decode_jit(feats, lens))
            if gen_args.save_nbest:
                seqs, scores, comps = out
                nbest_store.append((seqs, scores, comps))
            else:
                seqs, scores = out
            return [
                tokenizer.decode([int(t) for t in row[0]], skip_special_tokens=True)
                for row in seqs
            ], None

    collator = SpeechCollator(
        CollatorConfig(bucketing=BucketingConfig(batch_size=eval_args.batch_size,
                                                 pad_to_multiple=16000))
    )
    test_splits = {
        name: ds for name, ds in dataset.items() if name != data_cfg.train_split
    }
    normalizer = None
    if gen_args.post_process_predictions:
        from huggingface_asr_tpu.utils.normalizer import EnglishNormalizer

        normalizer = EnglishNormalizer()
    results = evaluate_splits(
        decode_batch,
        {n: eval_batches(ds, collator, eval_args.batch_size) for n, ds in test_splits.items()},
        {n: split_references(ds, data_cfg.text_column_name) for n, ds in test_splits.items()},
        output_dir=eval_args.output_dir,
        normalizer=normalizer,
    )
    if eval_args.model_type == "aed" and gen_args.save_nbest and nbest_store:
        seqs = np.concatenate([s for s, _, _ in nbest_store], axis=0)
        scores = np.concatenate([s for _, s, _ in nbest_store], axis=0)
        save_nbests(
            os.path.join(eval_args.output_dir, "nbest"),
            seqs, scores,
            lambda toks: tokenizer.decode(toks, skip_special_tokens=True),
        )
        # per-component score streams (reference postprocess_beam_outputs,
        # general_utils.py:115-126 splits joint/dec/ctc/lm)
        for name in ("att", "ctc", "lm"):
            comp = np.concatenate([c[name] for _, _, c in nbest_store], axis=0)
            path = os.path.join(eval_args.output_dir, f"nbest_{name}_scores.txt")
            with open(path, "w") as f:
                for i in range(comp.shape[0]):
                    for w in range(comp.shape[1]):
                        f.write(f"utt_{i}-{w} {comp[i, w]:.6f}\n")
    return results


if __name__ == "__main__":
    main()
