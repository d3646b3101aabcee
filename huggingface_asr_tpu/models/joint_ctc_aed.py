"""Joint CTC + attention encoder-decoder (DeCRED / "ED") — TPU-native.

Behavioral twin of the reference's JointCTCAttentionEncoderDecoder
(reference: src/models/ctc_encoder_plus_autoregressive_decoder.py:61-358):
an E-Branchformer ForCTC encoder (CTC loss computed from encoder logits)
feeds a GPT-2 multi-head decoder through cross-attention, with

    loss = ctc_weight * L_ctc + (1 - ctc_weight) * L_dec(label-smoothed CE)

and optional encoder→decoder projection when hidden sizes differ
(reference :122) and a shared vocab head (reference :132-133).

Design departures (TPU-first, not behavioral):
  * No forward hooks — the encoder returns hidden states and logits
    explicitly (the reference needs hooks only because HF's ForCTC hides
    hidden states, reference :34-52).
  * Decoder teacher forcing uses the standard [bos]+y[:-1] → y convention
    (see gpt2_decoder.py for the equivalence argument).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import (
    CTCOutput,
    EBranchformerForCTC,
    EBranchformerModel,
)
from huggingface_asr_tpu.models.gpt2_decoder import (
    GPT2DecoderConfig,
    GPT2MultiHeadDecoder,
)
from huggingface_asr_tpu.ops.ctc import ctc_loss as ctc_loss_fn
from huggingface_asr_tpu.ops.lengths import lengths_to_mask


@dataclasses.dataclass(frozen=True)
class JointCTCAttentionConfig:
    encoder: EBranchformerConfig = EBranchformerConfig()
    decoder: GPT2DecoderConfig = GPT2DecoderConfig()
    ctc_weight: float = 0.3
    shared_lm_head: bool = False
    decoder_start_token_id: int = 0
    pad_token_id: int = 3


@dataclasses.dataclass
class JointOutput:
    loss: Optional[jnp.ndarray]
    enc_loss: Optional[jnp.ndarray]
    dec_loss: Optional[jnp.ndarray]
    logits: jnp.ndarray  # decoder logits
    encoder_logits: jnp.ndarray  # CTC logits (for joint decoding)
    encoder_hidden: jnp.ndarray
    encoder_lengths: jnp.ndarray


def shift_right(labels: jnp.ndarray, start_id: int) -> jnp.ndarray:
    """[y0..y_{L-1}] -> [start, y0..y_{L-2}]."""
    return jnp.concatenate(
        [jnp.full_like(labels[:, :1], start_id), labels[:, :-1]], axis=1
    )


class JointCTCAttentionEncoderDecoder(nn.Module):
    config: JointCTCAttentionConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = EBranchformerForCTC(cfg.encoder, self.dtype, name="encoder")
        self.decoder = GPT2MultiHeadDecoder(cfg.decoder, self.dtype, name="decoder")
        if cfg.encoder.hidden_size != cfg.decoder.n_embd:
            self.enc_to_dec_proj = nn.Dense(
                cfg.decoder.n_embd, dtype=self.dtype, name="enc_to_dec_proj"
            )
        else:
            self.enc_to_dec_proj = None

    def encode(
        self,
        input_features: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        label_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[CTCOutput, jnp.ndarray]:
        """Run encoder; returns (CTCOutput, projected hidden for cross-attn)."""
        enc = self.encoder(
            input_features,
            input_lengths,
            labels=labels,
            label_lengths=label_lengths,
            deterministic=deterministic,
            output_hidden_states=True,
        )
        hidden = enc.hidden_states[-1]
        if self.enc_to_dec_proj is not None:
            hidden = self.enc_to_dec_proj(hidden)
        return enc, hidden

    def decode_step(
        self,
        input_ids: jnp.ndarray,
        encoder_hidden: jnp.ndarray,
        encoder_lengths: jnp.ndarray,
        position_offset: Optional[jnp.ndarray] = None,
    ):
        """One incremental decoder step (KV-cached); logits for the last token."""
        out = self.decoder(
            input_ids,
            encoder_hidden=encoder_hidden,
            encoder_lengths=encoder_lengths,
            deterministic=True,
            decode=True,
            position_offset=position_offset,
        )
        return out.logits

    def __call__(
        self,
        input_features: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        label_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> JointOutput:
        cfg = self.config
        enc, cross_hidden = self.encode(
            input_features, input_lengths,
            labels=labels, label_lengths=label_lengths,
            deterministic=deterministic,
        )

        dec_loss = enc_loss = loss = None
        if labels is not None:
            enc_loss = enc.loss
            decoder_input_ids = shift_right(labels, cfg.decoder_start_token_id)
            label_mask = lengths_to_mask(label_lengths, labels.shape[1])
            dec_out = self.decoder(
                decoder_input_ids,
                encoder_hidden=cross_hidden,
                encoder_lengths=enc.logit_lengths,
                labels=labels,
                label_mask=label_mask,
                deterministic=deterministic,
            )
            dec_loss = dec_out.loss
            loss = cfg.ctc_weight * enc_loss + (1.0 - cfg.ctc_weight) * dec_loss
            logits = dec_out.logits
        else:
            dec_out = self.decoder(
                shift_right(
                    jnp.zeros((input_features.shape[0], 1), jnp.int32),
                    cfg.decoder_start_token_id,
                ),
                encoder_hidden=cross_hidden,
                encoder_lengths=enc.logit_lengths,
                deterministic=deterministic,
            )
            logits = dec_out.logits

        return JointOutput(
            loss=loss,
            enc_loss=enc_loss,
            dec_loss=dec_loss,
            logits=logits,
            encoder_logits=enc.logits,
            encoder_hidden=cross_hidden,
            encoder_lengths=enc.logit_lengths,
        )
