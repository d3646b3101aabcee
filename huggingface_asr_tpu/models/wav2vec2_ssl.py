"""wav2vec2-style contrastive pretraining over the E-Branchformer body.

Behavioral twin of the reference's ``Wav2Vec2EBranchformerForPreTraining``
(reference: src/models/encoders/e_branchformer.py:337-358, which wires HF's
Wav2Vec2ForPreTraining objective — Gumbel-softmax vector quantizer,
contrastive + diversity loss — onto the custom encoder, with the quantizer's
input projection taken from ``hidden_size`` instead of conv_dim[-1]).

Pieces: GumbelVectorQuantizer (G groups × V codes, temperature-annealed
gumbel-softmax at train time, hard argmax at eval), masked positions replaced
by a learned embedding, cosine-similarity contrastive logits against sampled
negatives, diversity loss = (GV − perplexity)/GV.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import EBranchformerModel
from huggingface_asr_tpu.ops.lengths import lengths_to_mask


@dataclasses.dataclass
class Wav2Vec2SSLOutput:
    loss: jnp.ndarray
    contrastive_loss: jnp.ndarray
    diversity_loss: jnp.ndarray
    codevector_perplexity: jnp.ndarray
    num_masked: jnp.ndarray
    projected_states: jnp.ndarray
    projected_quantized_states: jnp.ndarray


class GumbelVectorQuantizer(nn.Module):
    """G×V codebook with gumbel-softmax selection (HF-equivalent math)."""

    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,  # (B, T, H) — extract_features (normed)
        mask: jnp.ndarray,  # (B, T) valid positions
        temperature: jnp.ndarray,
        train: bool = False,
        gumbel_rng: Optional[jax.Array] = None,
    ):
        cfg = self.config
        G, V = cfg.num_codevector_groups, cfg.num_codevectors_per_group
        B, T, _ = hidden.shape
        d = cfg.codevector_dim

        codevectors = self.param(
            "codevectors",
            nn.initializers.uniform(scale=1.0),
            (1, G * V, d // G),
            jnp.float32,
        )
        logits = nn.Dense(G * V, dtype=self.dtype, name="weight_proj")(hidden)
        logits = logits.reshape(B * T * G, V).astype(jnp.float32)

        if train:
            if gumbel_rng is None:
                gumbel_rng = self.make_rng("gumbel")
            g = jax.random.gumbel(gumbel_rng, logits.shape)
            probs_hard = jax.nn.one_hot(
                jnp.argmax(logits + g, axis=-1), V, dtype=jnp.float32
            )
            probs_soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
            # straight-through
            codevector_probs = probs_soft + jax.lax.stop_gradient(
                probs_hard - probs_soft
            )
            marginal = jax.nn.softmax(logits.reshape(B * T, G, V), axis=-1)
        else:
            idx = jnp.argmax(logits, axis=-1)
            codevector_probs = jax.nn.one_hot(idx, V, dtype=jnp.float32)
            marginal = codevector_probs.reshape(B * T, G, V)

        # perplexity over valid positions
        m = mask.reshape(B * T, 1, 1).astype(jnp.float32)
        probs_mean = jnp.sum(marginal * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)
        perplexity = jnp.sum(
            jnp.exp(-jnp.sum(probs_mean * jnp.log(probs_mean + 1e-7), axis=-1))
        )

        cv = codevector_probs.reshape(B * T, G * V, 1) * codevectors
        cv = cv.reshape(B * T, G, V, d // G).sum(axis=2).reshape(B, T, d)
        return cv.astype(self.dtype), perplexity


def _cosine_sim(a, b, eps=1e-8):
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return jnp.sum(a * b, axis=-1)


class Wav2Vec2ForPreTraining(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: jnp.ndarray,
        input_lengths: jnp.ndarray,
        mask_time_indices: jnp.ndarray,  # (B, T_enc) bool
        sampled_negative_indices: jnp.ndarray,  # (B, T_enc, N) flat time idx
        # NOTE: a plain float default — a jnp.asarray default would run a
        # device op at class-definition (import) time, initializing the
        # backend before the caller can pick a platform.
        gumbel_temperature: Any = 2.0,
        deterministic: bool = True,
    ) -> Wav2Vec2SSLOutput:
        cfg = self.config
        enc = EBranchformerModel(cfg, self.dtype, name="wav2vec2")(
            input_features,
            input_lengths,
            deterministic=deterministic,
            mask_time_indices=mask_time_indices,  # learned mask embedding
        )
        B, T, _ = enc.last_hidden_state.shape
        valid = lengths_to_mask(enc.lengths, T)

        transformer_out = nn.Dense(
            cfg.proj_codevector_dim, dtype=self.dtype, name="project_hid"
        )(enc.last_hidden_state)

        quantized, perplexity = GumbelVectorQuantizer(cfg, self.dtype, name="quantizer")(
            jax.lax.stop_gradient(enc.extract_features)
            if cfg.feat_quantizer_dropout == 0.0
            else enc.extract_features,
            valid & mask_time_indices,
            gumbel_temperature,
            train=not deterministic,
        )
        quantized = nn.Dense(
            cfg.proj_codevector_dim, dtype=self.dtype, name="project_q"
        )(quantized)

        # Negatives: gather quantized targets at sampled time positions.
        neg = jax.vmap(lambda q, idx: q[idx])(quantized, sampled_negative_indices)
        # neg: (B, T, N, D)

        pos_logits = _cosine_sim(transformer_out, quantized)  # (B, T)
        neg_logits = _cosine_sim(transformer_out[:, :, None, :], neg)  # (B, T, N)
        # HF: where negative == positive target, mask with -inf
        same = jnp.all(jnp.isclose(neg, quantized[:, :, None, :]), axis=-1)
        neg_logits = jnp.where(same, -jnp.inf, neg_logits)

        logits = (
            jnp.concatenate([pos_logits[..., None], neg_logits], axis=-1)
            / cfg.contrastive_logits_temperature
        )  # (B, T, 1+N)
        logp = jax.nn.log_softmax(logits, axis=-1)
        target_mask = (mask_time_indices & valid).astype(jnp.float32)
        contrastive = -jnp.sum(logp[..., 0] * target_mask)
        num_masked = jnp.sum(target_mask)

        G, V = cfg.num_codevector_groups, cfg.num_codevectors_per_group
        diversity = (G * V - perplexity) / (G * V)
        loss = contrastive + cfg.diversity_loss_weight * diversity * num_masked

        return Wav2Vec2SSLOutput(
            loss=loss,
            contrastive_loss=contrastive,
            diversity_loss=diversity,
            codevector_perplexity=perplexity,
            num_masked=num_masked,
            projected_states=transformer_out,
            projected_quantized_states=quantized,
        )
