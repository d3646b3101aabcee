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

    dataset = get_dataset(dataclasses.replace(data_cfg, audio_column_name=None))
    tokenizer = load_tokenizer(model_args.tokenizer_name)
    ids = tokenizer_ids(tokenizer)

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

    texts = list(dataset[data_cfg.train_split][data_cfg.text_column_name])
    batches = packed_text_batches(
        texts, tokenizer, clm_args.block_size,
        training.per_device_train_batch_size, ids["bos"], training.seed,
    )
    example = next(batches)
    state = trainer.init_state(example)
    if training.restart_from:
        state = trainer.restore_checkpoint(state, None)

    metrics_logger = MetricsLogger(training.output_dir, use_wandb=training.report_to_wandb)
    state = trainer.fit(state, batches, hooks=[metrics_logger.log])
    trainer.save_checkpoint(state)
    save_params(jax.device_get(state.params), final_dir, config)
    metrics_logger.close()


if __name__ == "__main__":
    main()
