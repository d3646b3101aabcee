"""Whisper-encoder CTC model — TPU-native.

Behavioral twin of the reference's recipe-local ``WhisperEncoderForCTC``
(reference: recipes_v0.0.1/librispeech_whisper_ctc/whisper_ctc.py:120-251):
a Whisper-style audio encoder (2×Conv1d front end, fixed sinusoidal
positions, pre-LN transformer), a dim-matching projection to an LLM width,
one extra encoder layer at that width, optional 2× stride-2 conv
subsampling, and a CTC head whose blank is ``blank_token_id`` (NOT the
last index — unlike the E-Branchformer family). Includes the
``LearnableBlankLinear`` head variant (frozen LLM vocab head + trainable
blank column, reference whisper_llm.py:33-44).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.models.ebranchformer import CTCOutput
from huggingface_asr_tpu.ops.ctc import ctc_loss as ctc_loss_fn
from huggingface_asr_tpu.ops.lengths import lengths_to_mask

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class WhisperCTCConfig:
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    activation_function: str = "gelu"
    dropout: float = 0.0
    final_dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    # CTC head / extension
    vocab_size: int = 5000
    blank_token_id: int = 0
    llm_dim: int = 512  # dim of the extra layer + head (LLM width)
    additional_head_count: int = 8  # attention heads of the extra layer
    sub_sample: bool = False
    ctc_loss_reduction: str = "mean"
    learnable_blank_head: bool = False  # LearnableBlankLinear variant


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's sinusoidal position table (interleaved sin/cos halves)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


class WhisperAttention(nn.Module):
    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None):
        D, H = self.d_model, self.num_heads
        dh = D // H
        B, T, _ = x.shape
        # Whisper convention: k_proj has no bias.
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x) * (dh**-0.5)
        k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(x)
        q, k, v = (t.reshape(B, T, H, dh) for t in (q, k, v))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if attention_bias is not None:
            scores = scores + attention_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class WhisperEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    config: WhisperCTCConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, deterministic=True):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        x = x + WhisperAttention(self.d_model, self.num_heads, self.dtype,
                                 name="self_attn")(h, attention_bias)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return x + h


def whisper_output_lengths(config: WhisperCTCConfig, input_lengths):
    """Mel frames → encoder frames: conv2 stride 2 (+ optional 2× stride-2)."""
    lengths = (input_lengths - 1) // 2 + 1
    if config.sub_sample:
        for _ in range(2):
            lengths = (lengths + 1) // 2
    return lengths


class WhisperEncoderForCTC(nn.Module):
    config: WhisperCTCConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: jnp.ndarray,  # (B, T_mel, num_mel_bins)
        input_lengths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        label_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> CTCOutput:
        cfg = self.config
        B, T_mel, _ = input_features.shape
        if input_lengths is None:
            input_lengths = jnp.full((B,), T_mel, jnp.int32)

        x = input_features.astype(self.dtype)
        x = nn.Conv(cfg.d_model, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.d_model, (3,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        T = x.shape[1]
        if T > cfg.max_source_positions:
            raise ValueError(
                f"encoder frames {T} > max_source_positions "
                f"{cfg.max_source_positions}; shorten/pad inputs to at most "
                f"{2 * cfg.max_source_positions} mel frames"
            )
        pos = jnp.asarray(_sinusoids(cfg.max_source_positions, cfg.d_model),
                          self.dtype)
        x = x + pos[:T]

        enc_lengths = ((input_lengths - 1) // 2 + 1).astype(jnp.int32)
        enc_lengths = jnp.clip(enc_lengths, 0, T)
        mask = lengths_to_mask(enc_lengths, T)
        bias = jnp.where(mask, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)

        for i in range(cfg.encoder_layers):
            x = WhisperEncoderLayer(
                cfg.d_model, cfg.encoder_attention_heads, cfg.encoder_ffn_dim,
                cfg, self.dtype, name=f"layers_{i}",
            )(x, bias, deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)

        # dim matching + extra layer at LLM width (reference :129-135)
        x = nn.Dense(cfg.llm_dim, dtype=self.dtype, name="dim_matching")(x)
        x = WhisperEncoderLayer(
            cfg.llm_dim, cfg.additional_head_count, 4 * cfg.llm_dim, cfg,
            self.dtype, name="additional_layer_1",
        )(x, bias, deterministic)
        x = nn.Dropout(cfg.final_dropout)(x, deterministic=deterministic)

        out_lengths = enc_lengths
        if cfg.sub_sample:
            for i in (1, 2):
                x = nn.Conv(cfg.llm_dim, (3,), strides=(2,), padding=[(1, 1)],
                            use_bias=False, dtype=self.dtype,
                            name=f"subsample_conv{i}")(x)
                out_lengths = (out_lengths + 1) // 2

        if cfg.learnable_blank_head:
            # Frozen vocab head + trainable blank column (whisper_llm.py:33-44):
            # the vocab kernel gets zero gradients via stop_gradient.
            vocab_kernel = self.param(
                "lm_head_frozen_kernel",
                nn.initializers.lecun_normal(),
                (cfg.llm_dim, cfg.vocab_size),
                jnp.float32,
            )
            blank_kernel = self.param(
                "blank_kernel", nn.initializers.lecun_normal(),
                (cfg.llm_dim, 1), jnp.float32,
            )
            frozen = jax.lax.stop_gradient(vocab_kernel)
            logits = jnp.einsum(
                "btd,dv->btv", x.astype(jnp.float32), frozen
            )
            blank_logit = jnp.einsum("btd,dv->btv", x.astype(jnp.float32), blank_kernel)
            one_hot = jax.nn.one_hot(cfg.blank_token_id, cfg.vocab_size)
            logits = logits * (1 - one_hot) + blank_logit * one_hot
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype,
                              name="lm_head")(x)

        loss = None
        if labels is not None:
            loss = ctc_loss_fn(
                logits.astype(jnp.float32),
                out_lengths,
                labels,
                label_lengths,
                blank_id=cfg.blank_token_id,
                reduction=cfg.ctc_loss_reduction,
            )
        # hidden_states[-1] = the pre-head representation (LLM-ASR consumes it)
        return CTCOutput(
            logits=logits, logit_lengths=out_lengths, loss=loss, hidden_states=(x,)
        )
