"""High-level generation for the joint CTC+attention model.

Mirrors the reference's ``JointCTCAttentionEncoderDecoder.generate`` flow
(reference: src/models/ctc_encoder_plus_autoregressive_decoder.py:406-482):
encoder runs ONCE, its CTC logits are cached for the prefix scorer, encoder
states are beam-expanded, and the KV-cached decoder drives the compiled beam
search. Also provides jit CTC greedy decoding for encoder-only models.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.decoding.beam_search import BeamSearchConfig, joint_beam_search
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig, GPT2MultiHeadDecoder
from huggingface_asr_tpu.models.joint_ctc_aed import (
    JointCTCAttentionConfig,
    JointCTCAttentionEncoderDecoder,
)


def _expand_beams(x: jnp.ndarray, num_beams: int) -> jnp.ndarray:
    """(B, ...) -> (B*W, ...) via repeat_interleave (reference :420-448)."""
    return jnp.repeat(x, num_beams, axis=0)


def build_decoder_step(
    decoder_config: GPT2DecoderConfig,
    decoder_params,
    encoder_hidden: jnp.ndarray,  # (BW, S, D) already beam-expanded
    encoder_lengths: jnp.ndarray,  # (BW,)
    max_length: int,
    dtype=jnp.float32,
    kv_hidden: Optional[jnp.ndarray] = None,   # (B, S, D) UNexpanded
    kv_lengths: Optional[jnp.ndarray] = None,  # (B,)
):
    """Returns (step_fn, init_cache) for joint_beam_search.

    When ``kv_hidden``/``kv_lengths`` (the unexpanded encoder outputs) are
    given, the cross-attention K/V cache is written ONCE per batch element
    and shared across beams (CachedAttention folds the beam dim into the
    query-time dim) — W× less HBM read per decode step and real (W, S)
    matmuls instead of BW rank-1 dots. Without them, the cache is written
    from the beam-expanded hidden (legacy layout).
    """
    module = GPT2MultiHeadDecoder(
        decoder_config, dtype=dtype, decode_max_length=max_length
    )
    BW = encoder_hidden.shape[0]
    write_hidden = kv_hidden if kv_hidden is not None else encoder_hidden
    read_lengths = kv_lengths if kv_lengths is not None else encoder_lengths
    dummy = jnp.zeros((BW, 1), jnp.int32)
    init_vars = module.init(
        jax.random.key(0),
        dummy,
        encoder_hidden=encoder_hidden,
        encoder_lengths=encoder_lengths,
        decode=True,
        position_offset=jnp.zeros((BW,), jnp.int32),
    )
    # Populate each layer's encoder K/V cache ONCE (the per-step cross
    # c_attn recompute otherwise dominates beam-search FLOPs).
    _, kv_vars = module.apply(
        {"params": decoder_params, "cache": init_vars["cache"]},
        None,
        encoder_hidden=write_hidden,
        cross_kv_mode="write",
        mutable=["cache"],
    )
    init_cache = kv_vars["cache"]

    def step(cache, tokens, positions):
        out, vars_out = module.apply(
            {"params": decoder_params, "cache": cache},
            tokens,
            encoder_hidden=write_hidden,
            encoder_lengths=read_lengths,
            deterministic=True,
            decode=True,
            position_offset=positions,
            cross_kv_mode="read",
            mutable=["cache"],
        )
        return out.logits[:, -1, :], vars_out["cache"]

    return step, init_cache


def generate_joint(
    model: JointCTCAttentionEncoderDecoder,
    params,
    input_features: jnp.ndarray,
    input_lengths: jnp.ndarray,
    config: BeamSearchConfig,
    lm_config: Optional[GPT2DecoderConfig] = None,
    lm_params=None,
    fused_encoder="auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encoder once → beam-expand → compiled joint beam search.

    ``fused_encoder``: "auto" (default) runs the encoder as the fused Pallas
    mega-kernel path (models/fast_infer.py) when on TPU and the encoder
    config/dtype qualify (~2.3x the XLA encoder — README perf table); True
    forces it (raises if unsupported); False keeps the XLA encoder. The
    decode loop itself is unchanged either way.

    Returns (sequences (B, W, L), scores (B, W)).
    """
    cfg = model.config
    B = input_features.shape[0]
    W = config.num_beams

    from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused, fused_encoder_ok

    ok = fused_encoder_ok(cfg.encoder, model.dtype)
    use_fused = fused_encoder
    if use_fused == "auto":
        use_fused = jax.default_backend() == "tpu" and ok
    elif use_fused and not ok:
        raise ValueError(
            "fused_encoder=True but the encoder config/dtype is outside the "
            "fused kernel's support (needs relative positions, non-causal, "
            "macaron FF, bfloat16, no fine-tune adapters)"
        )

    if use_fused:
        bb = max(d for d in (8, 4, 2, 1) if B % d == 0)
        enc, cross_hidden = ctc_infer_fused(
            params["encoder"], cfg.encoder, input_features, input_lengths,
            bb=bb, return_hidden=True,
        )
        if "enc_to_dec_proj" in params:
            proj = params["enc_to_dec_proj"]
            cross_hidden = (
                cross_hidden.astype(model.dtype)
                @ jnp.asarray(proj["kernel"], model.dtype)
                + jnp.asarray(proj["bias"], model.dtype)
            )
    else:
        enc, cross_hidden = model.apply(
            {"params": params}, input_features, input_lengths, method=model.encode
        )
    ctc_log_probs = jax.nn.log_softmax(enc.logits.astype(jnp.float32), axis=-1)

    hidden_exp = _expand_beams(cross_hidden, W)
    lengths_exp = _expand_beams(enc.logit_lengths, W)

    decoder_step, init_cache = build_decoder_step(
        cfg.decoder,
        params["decoder"],
        hidden_exp,
        lengths_exp,
        config.max_length,
        dtype=model.dtype,
        kv_hidden=cross_hidden,
        kv_lengths=enc.logit_lengths,
    )

    lm_step = init_lm_cache = None
    if lm_config is not None and config.lm_weight != 0.0:
        lm_module = GPT2MultiHeadDecoder(
            lm_config, dtype=model.dtype, decode_max_length=config.max_length
        )
        BW = B * W
        lm_vars = lm_module.init(
            jax.random.key(0),
            jnp.zeros((BW, 1), jnp.int32),
            decode=True,
            position_offset=jnp.zeros((BW,), jnp.int32),
        )
        init_lm_cache = lm_vars["cache"]

        def lm_step(cache, tokens, positions):
            out, vars_out = lm_module.apply(
                {"params": lm_params, "cache": cache},
                tokens,
                deterministic=True,
                decode=True,
                position_offset=positions,
                mutable=["cache"],
            )
            return out.logits[:, -1, :], vars_out["cache"]

    return joint_beam_search(
        decoder_step,
        init_cache,
        B,
        config,
        ctc_log_probs=ctc_log_probs if config.ctc_weight > 0 else None,
        ctc_lengths=enc.logit_lengths,
        lm_step=lm_step,
        init_lm_cache=init_lm_cache,
        vocab_size=cfg.decoder.vocab_size,
    )


def build_whisper_decoder_step(
    model,
    params,
    encoder_hidden: jnp.ndarray,  # (BW, S, D) beam-expanded
    encoder_lengths: jnp.ndarray,
    max_length: int,
    forced_decoder_ids: Optional[Tuple[Tuple[int, int], ...]] = None,
    suppress_tokens: Optional[Tuple[int, ...]] = None,
    begin_suppress_tokens: Optional[Tuple[int, ...]] = None,
    kv_hidden: Optional[jnp.ndarray] = None,   # (B, S, D) UNexpanded
    kv_lengths: Optional[jnp.ndarray] = None,  # (B,)
):
    """(step_fn, init_cache) for Whisper AED beam search.

    Whisper generation specials (reference gets them through HF generate +
    handle_whisper_generation_config, model_utils.py:248-261) are fused into
    the compiled step as static logit transforms:
      * forced_decoder_ids: position p must emit token t (language/task
        prompt) — all other logits masked at that position.
      * suppress_tokens: never emitted.
      * begin_suppress_tokens: not emitted at the first generated position.
    """
    from huggingface_asr_tpu.models.whisper_seq2seq import WhisperDecoder

    module = WhisperDecoder(
        model.config, dtype=model.dtype, decode_max_length=max_length
    )
    BW = encoder_hidden.shape[0]
    write_hidden = kv_hidden if kv_hidden is not None else encoder_hidden
    read_lengths = kv_lengths if kv_lengths is not None else encoder_lengths
    dummy = jnp.zeros((BW, 1), jnp.int32)
    init_vars = module.init(
        jax.random.key(0),
        dummy,
        encoder_hidden=encoder_hidden,
        encoder_lengths=encoder_lengths,
        decode=True,
        position_offset=jnp.zeros((BW,), jnp.int32),
    )
    _, kv_vars = module.apply(
        {"params": params, "cache": init_vars["cache"]},
        None,
        encoder_hidden=write_hidden,
        cross_kv_mode="write",
        mutable=["cache"],
    )
    init_cache = kv_vars["cache"]

    forced = dict(forced_decoder_ids or ())
    suppress = jnp.asarray(suppress_tokens, jnp.int32) if suppress_tokens else None
    begin_suppress = (
        jnp.asarray(begin_suppress_tokens, jnp.int32)
        if begin_suppress_tokens
        else None
    )
    # Whisper's forced ids are indexed from generation position 1
    # (position 0 is decoder_start); our positions count generated steps
    # from 0 — shift by one.
    forced_by_pos = {p - 1: t for p, t in forced.items()}

    def step(cache, tokens, positions):
        logits, vars_out = module.apply(
            {"params": params, "cache": cache},
            tokens,
            encoder_hidden=write_hidden,
            encoder_lengths=read_lengths,
            deterministic=True,
            decode=True,
            position_offset=positions,
            cross_kv_mode="read",
            mutable=["cache"],
        )
        logits = logits[:, -1, :]
        pos = positions[0]  # all beams share the step index
        if suppress is not None:
            logits = logits.at[:, suppress].set(NEG_INF_GEN)
        if begin_suppress is not None:
            first = pos == 0
            sup = jnp.where(first, NEG_INF_GEN, 0.0)
            logits = logits.at[:, begin_suppress].add(sup)
        for p, tok in forced_by_pos.items():
            hit = pos == p
            mask = jax.nn.one_hot(tok, logits.shape[-1], dtype=logits.dtype)
            forced_row = mask * 0.0 + (1.0 - mask) * NEG_INF_GEN
            logits = jnp.where(hit, logits + forced_row, logits)
        return logits, vars_out["cache"]

    return step, init_cache


NEG_INF_GEN = -1.0e9


def generate_whisper(
    model,
    params,
    input_features: jnp.ndarray,
    input_lengths: jnp.ndarray,
    config: BeamSearchConfig,
    forced_decoder_ids: Optional[Tuple[Tuple[int, int], ...]] = None,
    suppress_tokens: Optional[Tuple[int, ...]] = None,
    begin_suppress_tokens: Optional[Tuple[int, ...]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whisper AED beam search: encoder once → beam-expand → compiled search
    (attention-only scores; pass ctc_weight=0)."""
    B = input_features.shape[0]
    W = config.num_beams

    enc_hidden, enc_lengths = model.apply(
        {"params": params}, input_features, input_lengths, method=model.encode
    )
    hidden_exp = _expand_beams(enc_hidden, W)
    lengths_exp = _expand_beams(enc_lengths, W)

    step, init_cache = build_whisper_decoder_step(
        model,
        params["decoder"],
        hidden_exp,
        lengths_exp,
        config.max_length,
        forced_decoder_ids=forced_decoder_ids,
        suppress_tokens=suppress_tokens,
        begin_suppress_tokens=begin_suppress_tokens,
        kv_hidden=enc_hidden,
        kv_lengths=enc_lengths,
    )
    return joint_beam_search(
        step,
        init_cache,
        B,
        config,
        vocab_size=model.config.vocab_size,
    )
