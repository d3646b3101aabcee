"""BEST-RQ self-supervised pretraining — TPU-native.

Behavioral twin of the reference (reference: src/models/bestrq.py:31-188):
a FROZEN random projection + FROZEN normalized codebook quantize stacked raw
mel frames into targets; the encoder sees the mel features with masked
frames replaced by N(0, 0.1) noise; per-book linear classifiers over the
encoder output are trained with summed CE over masked positions ÷ num_books
(the trainer then divides by the masked-frame count, reference
training_utils.py:242-248).

The frozen projection/codebook live in a separate ``buffers`` variable
collection — never touched by the optimizer, no stop-gradient gymnastics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import EBranchformerModel


def _xavier_uniform(rng, shape, dtype=jnp.float32):
    # fan_in/fan_out over the last two dims (torch semantics for 3-D: per-book)
    fan_in, fan_out = shape[-2], shape[-1]
    a = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -a, a)


@dataclasses.dataclass
class BestRQOutput:
    loss: jnp.ndarray  # summed CE over masked positions / num_books
    num_masked: jnp.ndarray
    logits: jnp.ndarray  # (books, B, T, codebook_size)
    targets: jnp.ndarray  # (B, books, T)
    last_hidden_state: jnp.ndarray


def _init_projection(cfg: EBranchformerConfig) -> jnp.ndarray:
    return _xavier_uniform(
        jax.random.key(0),
        (cfg.best_rq_num_books, cfg.best_rq_in_dim, cfg.best_rq_codebook_dim),
    )


def _init_codebook(cfg: EBranchformerConfig) -> jnp.ndarray:
    return _l2_normalize(
        jax.random.normal(
            jax.random.key(1),
            (cfg.best_rq_num_books, cfg.best_rq_codebook_size,
             cfg.best_rq_codebook_dim),
        )
    )


def make_bestrq_buffers(config: EBranchformerConfig):
    """Build the frozen RPQ buffers deterministically from the config —
    usable by trainers to (re)create buffers without a full model init
    (checkpoint restore into a fresh trainer)."""
    return {"rpq": {"P": _init_projection(config), "CB": _init_codebook(config)}}


class RandomProjectionQuantizer(nn.Module):
    """Frozen projection P and codebook CB (reference bestrq.py:66-80)."""

    config: EBranchformerConfig

    @nn.compact
    def __call__(self, stacked_features: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        P = self.variable("buffers", "P", lambda: _init_projection(cfg)).value
        CB = self.variable("buffers", "CB", lambda: _init_codebook(cfg)).value
        # (B, books, T, dim), L2-normalized like torch F.normalize
        proj = jnp.einsum("btf,kfd->bktd", stacked_features.astype(jnp.float32), P)
        proj = _l2_normalize(proj)
        # targets = argmin_v ||CB[k, v] - proj||
        # = argmax_v <CB, proj> since both L2-normalized
        sims = jnp.einsum("bktd,kvd->bktv", proj, CB)
        return jnp.argmax(sims, axis=-1).astype(jnp.int32)  # (B, books, T)


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class BestRQForPreTraining(nn.Module):
    """E-Branchformer encoder + BEST-RQ objective."""

    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: jnp.ndarray,  # (B, T_mel, F)
        input_lengths: jnp.ndarray,
        mask_time_indices: jnp.ndarray,  # (B, T_enc) bool over encoder frames
        noise_rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> BestRQOutput:
        cfg = self.config
        B, T_mel, F = input_features.shape
        T_enc = mask_time_indices.shape[1]
        stack = cfg.best_rq_in_dim // cfg.num_fbanks

        # Targets from raw stacked features (no grad by construction).
        usable = T_enc * stack
        stacked = input_features[:, :usable, :].reshape(B, T_enc, stack * F)
        targets = RandomProjectionQuantizer(cfg, name="rpq")(stacked)  # (B, K, T)

        # Masked-position noise N(0, 0.1) (reference BestRQMask, bestrq.py:83-97).
        if noise_rng is None:
            noise_rng = self.make_rng("mask_noise")
        noise = 0.1 * jax.random.normal(
            noise_rng, (B, T_enc, cfg.hidden_size), dtype=self.dtype
        )

        enc = EBranchformerModel(cfg, self.dtype, name="wav2vec2")(
            input_features,
            input_lengths,
            deterministic=deterministic,
            mask_time_indices=mask_time_indices,
            mask_noise=noise,
        )
        hidden = enc.last_hidden_state

        logits = jnp.stack(
            [
                nn.Dense(cfg.best_rq_codebook_size, dtype=self.dtype,
                         name=f"classifiers_{k}")(hidden)
                for k in range(cfg.best_rq_num_books)
            ],
            axis=0,
        )  # (K, B, T, V)

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = targets.transpose(1, 0, 2)  # (K, B, T)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]  # (K,B,T)
        valid = mask_time_indices & (
            jnp.arange(T_enc)[None, :] < enc.lengths[:, None]
        )
        loss = jnp.sum(nll * valid[None].astype(jnp.float32)) / cfg.best_rq_num_books
        num_masked = jnp.sum(valid)

        return BestRQOutput(
            loss=loss,
            num_masked=num_masked,
            logits=logits,
            targets=targets,
            last_hidden_state=hidden,
        )
