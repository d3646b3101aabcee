"""LLM-ASR: Whisper-CTC encoder feeding a causal LLM via soft prompts.

Behavioral twin of the reference's recipe-local ``LLMASRModel`` (reference:
recipes_v0.0.1/librispeech_whisper_ctc/local_models.py:10-243): the encoder's
CTC greedy output is deduplicated and blank-stripped, the hidden states of
the surviving frames are linearly projected and spliced into the LLM input as

    [bos] [soft_prompt × P] [asr frame embeds] [end_prompt] [label embeds…]

with CE trained on the label tail (+ optional weighted encoder CTC loss).
The reference packs with per-example Python loops and ragged padding; here
packing is static-shape — left-aligned compaction of surviving frames via the
same scatter trick as CTC greedy decode, per-example ``dynamic_update_slice``
under ``vmap`` for the label block, and an embeds-overlay handed to the LLM —
so the entire model jits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.gpt2_decoder import (
    GPT2DecoderConfig,
    GPT2MultiHeadDecoder,
    smoothed_cross_entropy,
)
from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig, WhisperEncoderForCTC
from huggingface_asr_tpu.ops.lengths import lengths_to_mask


@dataclasses.dataclass(frozen=True)
class LLMASRConfig:
    encoder: WhisperCTCConfig = WhisperCTCConfig()
    decoder: GPT2DecoderConfig = GPT2DecoderConfig(add_cross_attention=False)
    number_of_prompt_tokens: int = 16
    ctc_weight: float = 0.0  # aux encoder CTC loss weight
    # Text-prompting variant (reference whisper_llm_prompting.py): feed the
    # deduplicated CTC hypothesis TOKEN IDS through the LLM's own embedding
    # table instead of projected encoder frame embeddings.
    prompt_with_tokens: bool = False
    freeze_asr: bool = False
    freeze_llm: bool = False


@dataclasses.dataclass
class LLMASROutput:
    loss: Optional[jnp.ndarray]
    enc_loss: Optional[jnp.ndarray]
    llm_logits: jnp.ndarray
    encoder_logits: jnp.ndarray
    asr_lengths: jnp.ndarray  # surviving CTC frames per example
    token_plan: jnp.ndarray  # (B, L_total) id layout fed to the LLM


def _maybe_freeze(tree, freeze: bool):
    return jax.tree.map(jax.lax.stop_gradient, tree) if freeze else tree


class LLMASRModel(nn.Module):
    config: LLMASRConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: jnp.ndarray,
        input_lengths: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,  # (B, L) LLM-vocab ids, eos-terminated
        label_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> LLMASROutput:
        cfg = self.config
        dcfg = cfg.decoder
        P = cfg.number_of_prompt_tokens

        # Aux CTC loss (reference local_models.py ctc_weight): labels are
        # LLM-vocab ids, so the encoder head must share that vocab — the
        # reference guarantees this via its vocab-subset head; here the
        # config must set encoder.vocab_size accordingly.
        enc_labels = labels if (cfg.ctc_weight > 0.0 and labels is not None) else None
        enc = WhisperEncoderForCTC(cfg.encoder, self.dtype, name="encoder")(
            input_features, input_lengths,
            labels=enc_labels, label_lengths=label_lengths if enc_labels is not None else None,
            deterministic=deterministic,
        )
        enc_hidden = enc.hidden_states[-1]  # (B, T, llm_dim-ish)
        enc_logits = enc.logits
        if cfg.freeze_asr:
            enc_hidden = jax.lax.stop_gradient(enc_hidden)
            enc_logits = jax.lax.stop_gradient(enc_logits)
        B, T, _ = enc_logits.shape

        # CTC greedy: blank-strip + dedup surviving frames (reference :50-58).
        preds = jnp.argmax(enc_logits, axis=-1).astype(jnp.int32)
        valid_t = lengths_to_mask(enc.logit_lengths, T)
        prev = jnp.pad(preds[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
        keep = (preds != cfg.encoder.blank_token_id) & (preds != prev) & valid_t

        pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        pos = jnp.where(keep, pos, T)
        n_asr = jnp.sum(keep, axis=1).astype(jnp.int32)
        asr_buf = None
        asr_tok_buf = None
        if cfg.prompt_with_tokens:
            # compact the surviving token IDS (text prompting)
            pad_tok = dcfg.pad_token_id if dcfg.pad_token_id is not None else 0
            tok_buf = jnp.full((B, T + 1), pad_tok, jnp.int32)
            tok_buf = jax.vmap(lambda buf, p, v: buf.at[p].set(v))(tok_buf, pos, preds)
            asr_tok_buf = tok_buf[:, :T]
        else:
            frame_feats = nn.Dense(dcfg.n_embd, dtype=self.dtype, name="linear")(enc_hidden)
            asr_buf = jnp.zeros((B, T + 1, dcfg.n_embd), self.dtype)
            asr_buf = jax.vmap(lambda buf, p, v: buf.at[p].set(v))(asr_buf, pos, frame_feats)
            asr_buf = asr_buf[:, :T]

        soft_prompt = self.param(
            "soft_prompt", nn.initializers.normal(0.02),
            (P + 1, dcfg.n_embd), jnp.float32,
        ).astype(self.dtype)
        prompts, end_prompt = soft_prompt[1:], soft_prompt[0]

        pad_id = dcfg.pad_token_id if dcfg.pad_token_id is not None else 0
        L_lab = labels.shape[1] if labels is not None else 1
        L_total = 1 + P + T + 1 + L_lab

        # --- token-id plan: [bos][pad×P][pad×T][pad][labels at 1+P+n+1]
        tok_plan = jnp.full((B, L_total), pad_id, jnp.int32)
        tok_plan = tok_plan.at[:, 0].set(dcfg.bos_token_id)
        if cfg.prompt_with_tokens:
            # hypothesis tokens are REAL input ids — embedded by the LLM's wte
            tok_plan = tok_plan.at[:, 1 + P : 1 + P + T].set(asr_tok_buf)
        if labels is not None:
            tok_plan = jax.vmap(
                lambda row, n, lab: jax.lax.dynamic_update_slice(row, lab, (1 + P + n + 1,))
            )(tok_plan, n_asr, labels)

        # --- embedding overlay: prompts, ASR frames, end prompt
        overlay = jnp.zeros((B, L_total, dcfg.n_embd), self.dtype)
        overlay = overlay.at[:, 1 : 1 + P].set(prompts[None])
        if not cfg.prompt_with_tokens:
            overlay = overlay.at[:, 1 + P : 1 + P + T].set(asr_buf)
        pos_idx = jnp.arange(L_total)[None, :]
        end_pos = (1 + P + n_asr)[:, None]
        overlay = jnp.where(
            (pos_idx == end_pos)[..., None], end_prompt[None, None, :], overlay
        )
        if cfg.prompt_with_tokens:
            # only prompts + end prompt are overlaid; hypothesis tokens embed
            # through wte like ordinary text
            overlay_mask = ((pos_idx >= 1) & (pos_idx < 1 + P)) | (pos_idx == end_pos)
        else:
            overlay_mask = (pos_idx >= 1) & (pos_idx <= end_pos)  # prompts+asr+end

        decoder = GPT2MultiHeadDecoder(dcfg, self.dtype, name="decoder")
        dec_out = decoder(
            tok_plan,
            deterministic=deterministic,
            embeds_overlay=overlay,
            overlay_mask=overlay_mask,
        )
        llm_logits = dec_out.logits
        if cfg.freeze_llm:
            # gradients reach soft prompts / projection / encoder only via the
            # overlay; approximate freezing by stopping grads on the logits'
            # dependence is NOT possible post-hoc — freezing is enforced by
            # the optimizer mask (training.optim.freeze_mask) instead.
            pass

        loss = None
        if labels is not None:
            # position i predicts tok_plan[i+1]; train the label tail:
            # the end-prompt position predicts the first label, and so on.
            targets = tok_plan[:, 1:]
            tpos = jnp.arange(L_total - 1)[None, :]
            zone = (tpos >= end_pos) & (tpos < end_pos + label_lengths[:, None] + 0)
            # (end_pos row predicts labels[0]; last counted row predicts
            #  labels[label_len-1] == eos)
            lm_loss = smoothed_cross_entropy(
                llm_logits[:, :-1], targets, zone.astype(jnp.float32), dcfg.lsm_factor
            )
            loss = lm_loss
            if cfg.ctc_weight > 0.0 and enc.loss is not None:
                loss = loss + cfg.ctc_weight * enc.loss

        return LLMASROutput(
            loss=loss,
            enc_loss=enc.loss,
            llm_logits=llm_logits,
            encoder_logits=enc.logits,
            asr_lengths=n_asr,
            token_plan=tok_plan,
        )


def llm_asr_greedy_decode(
    model: LLMASRModel,
    params,
    input_features: jnp.ndarray,
    input_lengths: jnp.ndarray,
    max_len: int = 48,
):
    """Greedy generation from the LLM over the soft-prompt + ASR-frame prefix
    (reference local_utils.py do_evaluate drives HF ``generate`` on the LLM;
    recipes_v0.0.1/librispeech_whisper_ctc/local_utils.py).

    The LLM is causal, so the logit at absolute position ``end_pos + j``
    depends only on the prefix and labels[0..j-1] — a fixed-shape label
    buffer re-forwarded per step therefore yields exact greedy decoding
    without a KV cache. O(max_len) full forwards: fine for CLI evaluation,
    not a serving path.

    Returns (tokens (B, max_len) int32, lengths (B,) — cut at first eos).
    """
    dcfg = model.config.decoder
    pad_id = dcfg.pad_token_id if dcfg.pad_token_id is not None else 0
    B = input_features.shape[0]
    P = model.config.number_of_prompt_tokens

    def step(buf, j):
        out = model.apply(
            {"params": params}, input_features, input_lengths,
            labels=buf, label_lengths=jnp.full((B,), max_len, jnp.int32),
            deterministic=True,
        )
        end_pos = 1 + P + out.asr_lengths  # position whose logit predicts labels[j=0]
        logit_j = jax.vmap(lambda lg, e: lg[e + j])(out.llm_logits, end_pos)
        tok = jnp.argmax(logit_j, axis=-1).astype(jnp.int32)
        return buf.at[:, j].set(tok), tok

    buf = jnp.full((B, max_len), pad_id, jnp.int32)
    buf, _ = jax.lax.scan(step, buf, jnp.arange(max_len))
    is_eos = buf == dcfg.eos_token_id
    seen_eos = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) > 0
    lengths = jnp.sum(~seen_eos, axis=1).astype(jnp.int32)
    return buf, lengths
