"""Whisper encoder-decoder (seq2seq) — TPU-native.

The reference fine-tunes HF ``WhisperForConditionalGeneration`` directly as
its AED model (reference: src/trainers/train_enc_dec_asr.py:82-85 +
handle_whisper_generation_config, src/utilities/model_utils.py:248-261).
This is the Flax twin: the audio encoder shares its layer implementation
with ``whisper_ctc`` (conv front end, sinusoidal positions, pre-LN blocks);
the decoder adds learned positions, causal self-attention with a fixed-size
KV cache, cross-attention with write-once encoder K/V, and a lm head tied to
the token embedding — all shaped to drive ``decoding/beam_search`` (with
``ctc_weight=0``) through the same compiled search as DeCRED.

Whisper specials handled at decode time (see ``decoding/generate.py``):
``forced_decoder_ids`` (task/language prompt), ``suppress_tokens`` and
``begin_suppress_tokens`` — the reference gets these via HF's generate;
here they are static logit transforms fused into the compiled step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.models.whisper_ctc import (
    WhisperEncoderLayer,
    _sinusoids,
)
from huggingface_asr_tpu.ops.lengths import lengths_to_mask

NEG_INF = -1.0e9


@dataclasses.dataclass(frozen=True)
class WhisperSeq2SeqConfig:
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    decoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    vocab_size: int = 51865
    dropout: float = 0.0
    layer_norm_eps: float = 1e-5
    label_smoothing: float = 0.0
    # token ids (HF Whisper defaults)
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    pad_token_id: int = 50257

    @property
    def head_dim(self) -> int:
        return self.d_model // self.decoder_attention_heads

    @classmethod
    def from_hf_config(cls, hf) -> "WhisperSeq2SeqConfig":
        d = hf if isinstance(hf, dict) else hf.to_dict()
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names and v is not None})


@dataclasses.dataclass
class WhisperSeq2SeqOutput:
    logits: jnp.ndarray
    loss: Optional[jnp.ndarray] = None
    encoder_hidden: Optional[jnp.ndarray] = None
    encoder_lengths: Optional[jnp.ndarray] = None


class _Encoder(nn.Module):
    """Plain Whisper audio encoder (no CTC extensions)."""

    config: WhisperSeq2SeqConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features, input_lengths=None, deterministic=True):
        cfg = self.config
        B, T_mel, _ = input_features.shape
        if input_lengths is None:
            input_lengths = jnp.full((B,), T_mel, jnp.int32)
        from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig

        layer_cfg = WhisperCTCConfig(
            d_model=cfg.d_model, dropout=cfg.dropout,
            layer_norm_eps=cfg.layer_norm_eps,
        )
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
                f"{2 * cfg.max_source_positions} mel frames (HF Whisper "
                "errors identically)"
            )
        x = x + jnp.asarray(_sinusoids(cfg.max_source_positions, cfg.d_model),
                            self.dtype)[:T]
        lengths = jnp.clip((input_lengths - 1) // 2 + 1, 0, T).astype(jnp.int32)
        bias = jnp.where(lengths_to_mask(lengths, T), 0.0, NEG_INF)[
            :, None, None, :
        ].astype(jnp.float32)
        for i in range(cfg.encoder_layers):
            x = WhisperEncoderLayer(
                cfg.d_model, cfg.encoder_attention_heads, cfg.encoder_ffn_dim,
                layer_cfg, self.dtype, name=f"layers_{i}",
            )(x, bias, deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)
        return x, lengths


class _DecoderAttention(nn.Module):
    """Whisper-projection attention with the same cache protocol as
    gpt2_decoder.CachedAttention (variable names matter: beam search skips
    gathering 'cached_enc_*' leaves)."""

    config: WhisperSeq2SeqConfig
    cross: bool = False
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        kv_source=None,
        attention_bias=None,
        decode: bool = False,
        cross_kv_mode: Optional[str] = None,
    ):
        cfg = self.config
        D, H, dh = cfg.d_model, cfg.decoder_attention_heads, cfg.head_dim
        if x is not None:
            B, Tq, _ = x.shape

        if self.cross and cross_kv_mode == "write":
            k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k_proj")(kv_source)
            v = nn.Dense(D, dtype=self.dtype, name="v_proj")(kv_source)
            Bw, S, _ = kv_source.shape
            self.variable("cache", "cached_enc_key",
                          lambda: k.reshape(Bw, S, H, dh)).value = k.reshape(Bw, S, H, dh)
            self.variable("cache", "cached_enc_value",
                          lambda: v.reshape(Bw, S, H, dh)).value = v.reshape(Bw, S, H, dh)
            return None

        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x) * (dh**-0.5)
        if self.cross:
            if cross_kv_mode == "read":
                k4 = self.get_variable("cache", "cached_enc_key")
                v4 = self.get_variable("cache", "cached_enc_value")
                Bkv = k4.shape[0]
                if Bkv != B:
                    # Beam-shared cross-attention KV (see gpt2_decoder
                    # CachedAttention): the cache holds one copy per batch
                    # element; fold the beam dim into the query-time dim so
                    # K/V is read once per step and the contraction is a
                    # real (W, S) matmul. No causal mask in cross-attn, so
                    # the fold is exact.
                    W = B // Bkv
                    qf = q.reshape(Bkv, W * Tq, H, dh)
                    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k4).astype(jnp.float32)
                    if attention_bias is not None:
                        scores = scores + attention_bias
                    probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
                    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v4).reshape(B, Tq, D)
                    return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
                k = k4.reshape(B, -1, H * dh)
                v = v4.reshape(B, -1, H * dh)
            else:
                k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k_proj")(kv_source)
                v = nn.Dense(D, dtype=self.dtype, name="v_proj")(kv_source)
        else:
            k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k_proj")(x)
            v = nn.Dense(D, dtype=self.dtype, name="v_proj")(x)

        q = q.reshape(B, Tq, H, dh)
        k = k.reshape(B, -1, H, dh)
        v = v.reshape(B, -1, H, dh)

        if decode and not self.cross:
            cache_len = self.decode_max_length or cfg.max_target_positions
            is_init = self.has_variable("cache", "cached_key")
            ck = self.variable("cache", "cached_key", jnp.zeros,
                               (B, cache_len, H, dh), self.dtype)
            cv = self.variable("cache", "cached_value", jnp.zeros,
                               (B, cache_len, H, dh), self.dtype)
            idx = self.variable("cache", "cache_index",
                                lambda: jnp.zeros((), jnp.int32))
            if is_init:
                i = idx.value
                ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, i, 0, 0))
                cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, i, 0, 0))
                idx.value = i + Tq
                k, v = ck.value, cv.value
                valid = jnp.arange(cache_len) < idx.value
                attention_bias = jnp.where(valid, 0.0, NEG_INF)[None, None, None, :]

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if attention_bias is not None:
            scores = scores + attention_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, Tq, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class _DecoderLayer(nn.Module):
    config: WhisperSeq2SeqConfig
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        encoder_hidden=None,
        self_bias=None,
        cross_bias=None,
        deterministic=True,
        decode=False,
        cross_kv_mode=None,
    ):
        cfg = self.config
        if cross_kv_mode == "write":
            _DecoderAttention(cfg, cross=True, dtype=self.dtype,
                              name="encoder_attn")(None, encoder_hidden,
                                                   cross_kv_mode="write")
            return None
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        x = x + _DecoderAttention(
            cfg, dtype=self.dtype, decode_max_length=self.decode_max_length,
            name="self_attn",
        )(h, attention_bias=self_bias, decode=decode)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="encoder_attn_layer_norm")(x)
        x = x + _DecoderAttention(cfg, cross=True, dtype=self.dtype,
                                  name="encoder_attn")(
            h, encoder_hidden, attention_bias=cross_bias,
            cross_kv_mode=cross_kv_mode,
        )
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        h = nn.Dense(cfg.decoder_ffn_dim, dtype=self.dtype, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.d_model, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return x + h


class WhisperDecoder(nn.Module):
    config: WhisperSeq2SeqConfig
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        tokens: Optional[jnp.ndarray],  # (B, T)
        encoder_hidden=None,
        encoder_lengths=None,
        deterministic: bool = True,
        decode: bool = False,
        position_offset: Optional[jnp.ndarray] = None,
        cross_kv_mode: Optional[str] = None,
    ):
        cfg = self.config
        wte = nn.Embed(cfg.vocab_size, cfg.d_model,
                       embedding_init=nn.initializers.normal(0.02),
                       dtype=self.dtype, name="embed_tokens")
        if cross_kv_mode == "write":
            for i in range(cfg.decoder_layers):
                _DecoderLayer(cfg, self.dtype, name=f"layers_{i}")(
                    None, encoder_hidden=encoder_hidden, cross_kv_mode="write"
                )
            # touch shared params so init() creates them in this pass too
            return None

        B, T = tokens.shape
        x = wte(tokens)
        wpe = self.param("embed_positions", nn.initializers.normal(0.02),
                         (cfg.max_target_positions, cfg.d_model), jnp.float32)
        if decode and position_offset is not None:
            pos = wpe[position_offset][:, None, :]  # (B, 1, D), T==1
        else:
            pos = wpe[None, :T]
        x = (x + pos.astype(self.dtype)).astype(self.dtype)

        self_bias = None
        if not decode:
            causal = jnp.tril(jnp.ones((T, T), bool))
            self_bias = jnp.where(causal, 0.0, NEG_INF)[None, None]
        cross_bias = None
        if encoder_lengths is not None and encoder_hidden is not None:
            S = encoder_hidden.shape[1]
            cross_bias = jnp.where(
                lengths_to_mask(encoder_lengths, S), 0.0, NEG_INF
            )[:, None, None, :].astype(jnp.float32)

        for i in range(cfg.decoder_layers):
            x = _DecoderLayer(
                cfg, self.dtype, decode_max_length=self.decode_max_length,
                name=f"layers_{i}",
            )(x, encoder_hidden, self_bias, cross_bias, deterministic,
              decode, cross_kv_mode)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm")(x)
        # lm head tied to the token embedding (HF proj_out).
        logits = x.astype(jnp.float32) @ wte.embedding.T.astype(jnp.float32)
        return logits


class WhisperForConditionalGeneration(nn.Module):
    """Whisper AED: encoder + tied-embedding decoder + CE loss."""

    config: WhisperSeq2SeqConfig
    dtype: Any = jnp.float32
    decode_max_length: Optional[int] = None

    def setup(self):
        self.encoder = _Encoder(self.config, self.dtype, name="encoder")
        self.decoder = WhisperDecoder(
            self.config, self.dtype,
            decode_max_length=self.decode_max_length, name="decoder",
        )

    def encode(self, input_features, input_lengths=None, deterministic=True):
        return self.encoder(input_features, input_lengths, deterministic)

    def decode_step(self, tokens, positions, encoder_hidden=None,
                    encoder_lengths=None, cross_kv_mode=None):
        return self.decoder(
            tokens, encoder_hidden=encoder_hidden,
            encoder_lengths=encoder_lengths, deterministic=True, decode=True,
            position_offset=positions, cross_kv_mode=cross_kv_mode,
        )

    def __call__(
        self,
        input_features: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,      # (B, L) gold ids incl. eos
        label_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> WhisperSeq2SeqOutput:
        cfg = self.config
        enc, enc_lengths = self.encoder(input_features, input_lengths,
                                        deterministic)
        loss = None
        logits = None
        if labels is not None:
            B, L = labels.shape
            # aligned teacher forcing: input = [start] + y[:-1], target = y
            dec_in = jnp.concatenate(
                [jnp.full((B, 1), cfg.decoder_start_token_id, labels.dtype),
                 labels[:, :-1]], axis=1,
            )
            logits = self.decoder(
                dec_in, encoder_hidden=enc, encoder_lengths=enc_lengths,
                deterministic=deterministic,
            )
            mask = lengths_to_mask(label_lengths, L) if label_lengths is not None \
                else jnp.ones((B, L), bool)
            logp = jax.nn.log_softmax(logits, axis=-1)
            gold = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
            if cfg.label_smoothing > 0.0:
                smooth = jnp.mean(logp, axis=-1)
                gold = (1 - cfg.label_smoothing) * gold + cfg.label_smoothing * smooth
            loss = -jnp.sum(gold * mask) / jnp.maximum(jnp.sum(mask), 1)
        return WhisperSeq2SeqOutput(
            logits=logits, loss=loss, encoder_hidden=enc,
            encoder_lengths=enc_lengths,
        )
