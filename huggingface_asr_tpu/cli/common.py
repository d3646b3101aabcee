"""Shared glue for the CLI entry points (reference: src/trainers/*)."""

from __future__ import annotations

import itertools
import logging
import os
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

from huggingface_asr_tpu.data.bucketing import BucketedBatchSampler, BucketingConfig
from huggingface_asr_tpu.data.collator import CollatorConfig, SpeechCollator

logger = logging.getLogger(__name__)


def setup_compile_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache for every CLI entry point.

    XLA whole-model compiles dominate small-job startup (2–5 min for a train
    step through a remote-TPU transport); the persistent cache drops warm
    starts to seconds. The torch reference has no analogue (eager mode);
    this is the TPU-native equivalent of "no compile on restart".
    Default dir: $HF_ASR_COMPILE_CACHE or ~/.cache/hf_asr_tpu_xla.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "HF_ASR_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hf_asr_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:  # cache is an optimization, never fatal
        logger.warning("compile cache disabled: %s", e)


def setup_logging(output_dir: Optional[str] = None, level=logging.INFO):
    setup_compile_cache()
    handlers = [logging.StreamHandler()]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(output_dir, "train.log")))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )


def load_tokenizer(name_or_path: str):
    """Load an HF fast tokenizer from a local dir/file or the hub."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(name_or_path)


def tokenizer_ids(tokenizer) -> Dict[str, int]:
    return {
        "bos": tokenizer.bos_token_id if tokenizer.bos_token_id is not None else 0,
        "eos": tokenizer.eos_token_id if tokenizer.eos_token_id is not None else 1,
        "pad": tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 3,
        "unk": tokenizer.unk_token_id,
        "vocab_size": len(tokenizer),
    }


def load_fusion_lm(gen_args):
    """Load the external shallow-fusion LM named by ``--lm_model``.

    Mirrors the reference's end-to-end LM wiring (reference:
    src/trainers/train_enc_dec_asr.py:61-77 builds GenerationConfigCustom
    with lm_model/lm_weight; src/decoding/shallow_fussion.py:5-53 applies
    it). Here the LM is a checkpoint dir produced by ``cli/train_clm.py``
    (config.json + params); returns (lm_config, lm_params) for
    ``generate_joint``, or (None, None) when fusion is disabled.
    """
    if not getattr(gen_args, "lm_model", None) or gen_args.lm_weight == 0.0:
        return None, None
    from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig
    from huggingface_asr_tpu.training.model_factory import load_config, load_params

    lm_config = load_config(gen_args.lm_model, GPT2DecoderConfig)
    lm_params = load_params(gen_args.lm_model)
    logger.info(
        "shallow-fusion LM loaded from %s (weight %.3f)",
        gen_args.lm_model, gen_args.lm_weight,
    )
    return lm_config, lm_params


def dataset_lengths(dataset, length_column: str) -> np.ndarray:
    if length_column in dataset.column_names:
        return np.asarray(dataset[length_column], dtype=np.float64)
    raise KeyError(f"dataset lacks length column {length_column}")


def epoch_iterator(
    dataset,
    sampler: BucketedBatchSampler,
    collator: SpeechCollator,
    max_steps: Optional[int] = None,
    extra_fn: Optional[Callable[[dict], dict]] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite (or max_steps-bounded) epoch-cycling batch iterator."""
    step = 0
    for epoch in itertools.count():
        for idx in sampler.epoch_batches(epoch):
            batch = collator([dataset[int(i)] for i in idx])
            if extra_fn is not None:
                batch = extra_fn(batch)
            # Host-side throughput accounting: fit() must not touch device
            # arrays per step (a device fetch per step through the axon
            # tunnel costs ~30 ms).
            for key in ("input_values_lengths", "input_lengths", "label_lengths"):
                if key in batch:
                    batch["_num_audio_samples"] = np.asarray(
                        np.sum(batch[key]), np.int64
                    )
                    break
            else:
                if "input_ids" in batch:
                    batch["_num_audio_samples"] = np.asarray(
                        np.prod(batch["input_ids"].shape), np.int64
                    )
            yield batch
            step += 1
            if max_steps is not None and step >= max_steps:
                return


def eval_batches(
    dataset,
    collator: SpeechCollator,
    batch_size: int,
) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-batch-size eval iterator.

    The last ragged batch is padded to ``batch_size`` by repeating the final
    example so every eval batch has the SAME leading shape (one XLA compile
    instead of one per remainder size). The number of real rows rides along
    as ``batch["_num_real"]`` — consumers must pop it before a jitted call
    and truncate their outputs with it.
    """
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        num_real = len(idx)
        idx += [idx[-1]] * (batch_size - num_real)
        batch = collator([dataset[i] for i in idx])
        batch["_num_real"] = np.asarray(num_real, np.int32)
        yield batch


def split_references(dataset, text_column: str) -> List[str]:
    return list(dataset[text_column])
