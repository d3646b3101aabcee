"""Causal LM training entry point (reference: src/trainers/train_clm.py).

Trains the GPT-2-style decoder (no cross-attention) on text — used both to
initialize DeCRED decoders and as the external LM for shallow fusion. A
``skip_if_exists`` guard mirrors reference :290-292.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, Iterator, List

import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.cli.common import load_tokenizer, setup_logging, tokenizer_ids
from huggingface_asr_tpu.cli.train_ctc import build_trainer_config
from huggingface_asr_tpu.data.datasets import DataConfig, get_dataset
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig, GPT2MultiHeadDecoder
from huggingface_asr_tpu.ops.lengths import lengths_to_mask
from huggingface_asr_tpu.training.arguments import GeneralTrainingArguments, ModelArguments
from huggingface_asr_tpu.training.loop import BaseTrainer
from huggingface_asr_tpu.training.model_factory import save_params
from huggingface_asr_tpu.utils.argparsing import DataclassArgumentParser
from huggingface_asr_tpu.utils.logging_utils import MetricsLogger

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class CLMArguments:
    block_size: int = 256
    n_embd: int = 256
    n_layer: int = 6
    n_head: int = 4
    head_locations: tuple = ()
    head_weights: tuple = (1.0,)
    skip_if_exists: bool = True
    # Arbitrary raw text files (reference train_clm.py accepts
    # train_file/validation_file txt/json/csv, :267-334). One utterance per
    # line; when set, these REPLACE the dataset-config text source.
    train_text_file: str = ""
    validation_text_file: str = ""
    # Initialize from an external HF GPT-2 checkpoint (reference trains any
    # HF causal LM; we convert GPT-2-family state dicts into our decoder).
    from_hf_gpt2: str = ""
    max_eval_blocks: int = 0  # cap eval batches per eval pass; 0 = no cap


class CLMTrainer(BaseTrainer):
    def _init_args(self, batch):
        return (jnp.asarray(batch["input_ids"]),), {
            "labels": jnp.asarray(batch["labels"]),
            "label_mask": jnp.asarray(batch["label_mask"]),
        }

    def loss_and_metrics(self, params, batch, aug_rng, dropout_rng, step):
        out = self.model.apply(
            {"params": params},
            batch["input_ids"],
            labels=batch["labels"],
            label_mask=batch["label_mask"],
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )
        return out.loss, {"ppl": jnp.exp(jnp.minimum(out.loss, 20.0))}

    def eval_outputs(self, params, batch):
        out = self.model.apply(
            {"params": params},
            batch["input_ids"],
            labels=batch["labels"],
            label_mask=batch["label_mask"],
            deterministic=True,
        )
        return {"loss": out.loss}


def packed_text_batches(
    texts: List[str], tokenizer, block_size: int, batch_size: int, bos: int,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Concatenate-and-chunk packing (HF run_clm convention)."""
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(len(texts))
        buf: List[int] = []
        batch_rows = []
        for idx in order:
            ids = tokenizer.encode(texts[int(idx)])
            if hasattr(ids, "ids"):
                ids = ids.ids
            buf.extend(ids)
            while len(buf) >= block_size:
                batch_rows.append(buf[:block_size])
                buf = buf[block_size:]
                if len(batch_rows) == batch_size:
                    chunk = np.asarray(batch_rows, dtype=np.int32)
                    inputs = np.concatenate(
                        [np.full((batch_size, 1), bos, np.int32), chunk[:, :-1]], axis=1
                    )
                    yield {
                        "input_ids": inputs,
                        "labels": chunk,
                        "label_mask": np.ones_like(chunk, dtype=bool),
                    }
                    batch_rows = []


def packed_eval_batches(
    texts: List[str], tokenizer, block_size: int, batch_size: int, bos: int,
) -> List[Dict[str, np.ndarray]]:
    """Single-pass packing for perplexity eval: every full block is yielded
    exactly once; the final partial batch is padded with mask=False rows."""
    buf: List[int] = []
    rows: List[List[int]] = []
    for text in texts:
        ids = tokenizer.encode(text)
        if hasattr(ids, "ids"):
            ids = ids.ids
        buf.extend(ids)
        while len(buf) >= block_size:
            rows.append(buf[:block_size])
            buf = buf[block_size:]
    batches = []
    for i in range(0, len(rows), batch_size):
        chunk_rows = rows[i : i + batch_size]
        n_real = len(chunk_rows)
        while len(chunk_rows) < batch_size:
            chunk_rows.append([bos] * block_size)
        chunk = np.asarray(chunk_rows, dtype=np.int32)
        inputs = np.concatenate(
            [np.full((batch_size, 1), bos, np.int32), chunk[:, :-1]], axis=1
        )
        mask = np.zeros((batch_size, block_size), dtype=bool)
        mask[:n_real] = True
        batches.append({"input_ids": inputs, "labels": chunk, "label_mask": mask})
    return batches


def main(argv=None):
    parser = DataclassArgumentParser(
        [ModelArguments, GeneralTrainingArguments, CLMArguments, DataConfig]
    )
    model_args, training, clm_args, data_cfg = parser.parse_args_into_dataclasses(argv)
    setup_logging(training.output_dir)

    final_dir = os.path.join(training.output_dir, "final")
    if clm_args.skip_if_exists and os.path.exists(os.path.join(final_dir, "config.json")):
        logger.info("model already exists at %s, skipping (skip_if_exists)", final_dir)
        return

    tokenizer = load_tokenizer(model_args.tokenizer_name)
    ids = tokenizer_ids(tokenizer)

    # Text sources: raw files override the dataset config (reference
    # train_clm.py accepts train_file/validation_file, :267-334).
    eval_texts: List[str] = []
    if clm_args.train_text_file:
        with open(clm_args.train_text_file) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
        if clm_args.validation_text_file:
            with open(clm_args.validation_text_file) as f:
                eval_texts = [ln.strip() for ln in f if ln.strip()]
    else:
        dataset = get_dataset(dataclasses.replace(data_cfg, audio_column_name=None))
        texts = list(dataset[data_cfg.train_split][data_cfg.text_column_name])
        if data_cfg.validation_split in dataset:
            eval_texts = list(
                dataset[data_cfg.validation_split][data_cfg.text_column_name]
            )

    if clm_args.from_hf_gpt2:
        # Initialize from an external HF GPT-2 checkpoint — makes any
        # GPT-2-family hub LM usable for fusion/DeCRED init.
        import torch
        from transformers import GPT2Config, GPT2LMHeadModel

        from huggingface_asr_tpu.interop.hf_decred import (
            convert_gpt2_decoder_state_dict,
        )

        hf_cfg = GPT2Config.from_pretrained(clm_args.from_hf_gpt2)
        # The checkpoint's embedding table is indexed by the CLI tokenizer's
        # ids: a vocab mismatch would silently clamp out-of-range ids in
        # jnp.take and corrupt training instead of erroring.
        if ids["vocab_size"] > hf_cfg.vocab_size:
            raise ValueError(
                f"--tokenizer_name vocab ({ids['vocab_size']}) exceeds "
                f"{clm_args.from_hf_gpt2} vocab ({hf_cfg.vocab_size}); "
                "use the checkpoint's own tokenizer or retrain from scratch"
            )
        config = GPT2DecoderConfig(
            vocab_size=hf_cfg.vocab_size,
            n_positions=hf_cfg.n_positions,
            n_embd=hf_cfg.n_embd,
            n_layer=hf_cfg.n_layer,
            n_head=hf_cfg.n_head,
            n_inner=hf_cfg.n_inner,
            add_cross_attention=False,
            bos_token_id=ids["bos"],
            eos_token_id=ids["eos"],
            pad_token_id=ids["pad"],
        )
        hf_model = GPT2LMHeadModel.from_pretrained(clm_args.from_hf_gpt2)
        init_params = convert_gpt2_decoder_state_dict(
            {k: v.numpy() for k, v in hf_model.state_dict().items()}, config
        )
        del hf_model
    else:
        init_params = None
        config = GPT2DecoderConfig(
            vocab_size=ids["vocab_size"],
            n_positions=clm_args.block_size + 1,
            n_embd=clm_args.n_embd,
            n_layer=clm_args.n_layer,
            n_head=clm_args.n_head,
            head_locations=tuple(clm_args.head_locations),
            head_weights=tuple(clm_args.head_weights),
            add_cross_attention=False,
            bos_token_id=ids["bos"],
            eos_token_id=ids["eos"],
            pad_token_id=ids["pad"],
            pos_emb_fixed=model_args.decoder_pos_emb_fixed,
        )
    model = GPT2MultiHeadDecoder(config)
    trainer = CLMTrainer(model, build_trainer_config(training))

    batches = packed_text_batches(
        texts, tokenizer, clm_args.block_size,
        training.per_device_train_batch_size, ids["bos"], training.seed,
    )
    example = next(batches)
    state = (
        trainer.make_state(init_params)
        if init_params is not None
        else trainer.init_state(example)
    )
    # Resume semantics (reference train_clm.py:321-334 get_last_checkpoint):
    # --restart_from resumes explicitly; otherwise auto-resume from the
    # output dir's latest checkpoint if one exists.
    if training.restart_from:
        state = trainer.restore_checkpoint(state, None)
    elif trainer.config.checkpoint_dir and os.path.isdir(trainer.config.checkpoint_dir):
        latest = trainer.checkpoint_manager.latest_step()
        if latest is not None:
            logger.info("auto-resuming from checkpoint step %d", latest)
            state = trainer.restore_checkpoint(state, latest)

    def eval_fn(state):
        """Held-out perplexity over the validation text (reference
        run_clm-style eval, train_clm.py:636-651): one pass over all
        validation blocks, token-weighted mean NLL -> perplexity."""
        ev = packed_eval_batches(
            eval_texts, tokenizer, clm_args.block_size,
            training.per_device_eval_batch_size, ids["bos"],
        )
        if clm_args.max_eval_blocks:
            ev = ev[: clm_args.max_eval_blocks]
        loss_sum = tok_sum = 0.0
        for batch in ev:
            out = jax.device_get(trainer.eval_step(state.params, batch))
            n_tok = float(batch["label_mask"].sum())
            loss_sum += float(out["loss"]) * n_tok
            tok_sum += n_tok
        if tok_sum == 0:
            return {}
        mean_loss = loss_sum / tok_sum
        return {"loss": mean_loss, "perplexity": float(np.exp(min(mean_loss, 20.0)))}

    metrics_logger = MetricsLogger(training.output_dir, use_wandb=training.report_to_wandb)
    state = trainer.fit(
        state, batches, eval_fn=eval_fn if eval_texts else None,
        hooks=[metrics_logger.log],
    )
    trainer.save_checkpoint(state)
    save_params(jax.device_get(state.params), final_dir, config)
    if eval_texts:
        final_eval = eval_fn(state)
        logger.info("final eval: %s", final_eval)
        with open(os.path.join(training.output_dir, "clm_eval.json"), "w") as f:
            import json

            json.dump(final_eval, f)
    metrics_logger.close()


if __name__ == "__main__":
    main()
