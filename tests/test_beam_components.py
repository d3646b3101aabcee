"""Beam search score-component tracking (att/ctc/lm) and shallow fusion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.decoding.beam_search import BeamSearchConfig, joint_beam_search
from huggingface_asr_tpu.decoding.generate import build_decoder_step
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig, GPT2MultiHeadDecoder

DEC = GPT2DecoderConfig(
    vocab_size=30, n_positions=32, n_embd=16, n_layer=1, n_head=2,
    add_cross_attention=True, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    bos_token_id=0, eos_token_id=1, pad_token_id=3,
)


def _setup(B=2, W=2, S=6, max_len=8, seed=0):
    rng = np.random.default_rng(seed)
    enc_hidden = jnp.asarray(
        np.repeat(rng.standard_normal((B, S, 16)).astype(np.float32), W, axis=0)
    )
    enc_lens = jnp.full((B * W,), S, jnp.int32)
    dec = GPT2MultiHeadDecoder(DEC)
    tokens = jnp.zeros((1, 3), jnp.int32)
    params = dec.init(
        jax.random.key(0), tokens, encoder_hidden=enc_hidden[:1],
        encoder_lengths=enc_lens[:1], labels=tokens, label_mask=jnp.ones((1, 3), bool),
    )["params"]
    step, cache = build_decoder_step(DEC, params, enc_hidden, enc_lens, max_len)
    ctc_lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, 10, 31)).astype(np.float32)), axis=-1
    )
    return step, cache, ctc_lp, params


def test_components_sum_to_total():
    step, cache, ctc_lp, _ = _setup()
    w = 0.3
    cfg = BeamSearchConfig(
        num_beams=2, max_length=8, ctc_weight=w, num_candidates=8,
        length_penalty=0.0, return_components=True,
    )
    seqs, scores, comps = joint_beam_search(
        step, cache, 2, cfg,
        ctc_log_probs=ctc_lp, ctc_lengths=jnp.asarray([10, 7]), vocab_size=30,
    )
    recon = (1 - w) * comps["att"] + w * comps["ctc"]
    s = np.asarray(scores)
    # finished hypotheses: length_penalty=0 → score == raw sum == reconstruction
    finite = s > -1e8
    np.testing.assert_allclose(
        np.asarray(recon)[finite], s[finite], rtol=1e-4, atol=1e-4
    )
    assert np.all(np.asarray(comps["lm"]) == 0.0)


def test_lm_fusion_changes_result_and_tracks_component():
    step, cache, ctc_lp, params = _setup()
    # LM: another decoder (no cross attention)
    lm_cfg = GPT2DecoderConfig(
        vocab_size=30, n_positions=32, n_embd=16, n_layer=1, n_head=2,
        add_cross_attention=False, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    lm = GPT2MultiHeadDecoder(lm_cfg, decode_max_length=8)
    lm_tokens = jnp.zeros((4, 1), jnp.int32)
    lm_vars = lm.init(
        jax.random.key(5), lm_tokens, decode=True,
        position_offset=jnp.zeros((4,), jnp.int32),
        labels=lm_tokens, label_mask=jnp.ones((4, 1), bool),
    )
    lm_params, lm_cache = lm_vars["params"], lm_vars["cache"]

    def lm_step(cache, tokens, positions):
        out, vo = lm.apply(
            {"params": lm_params, "cache": cache}, tokens, decode=True,
            position_offset=positions, mutable=["cache"],
        )
        return out.logits[:, -1, :], vo["cache"]

    base_cfg = BeamSearchConfig(
        num_beams=2, max_length=8, ctc_weight=0.3, num_candidates=8,
        length_penalty=0.0, return_components=True,
    )
    seqs0, scores0, comps0 = joint_beam_search(
        step, cache, 2, base_cfg,
        ctc_log_probs=ctc_lp, ctc_lengths=jnp.asarray([10, 7]), vocab_size=30,
    )
    fused_cfg = BeamSearchConfig(**{**base_cfg.__dict__, "lm_weight": 0.5})
    step2, cache2, ctc2, _ = _setup()
    seqs1, scores1, comps1 = joint_beam_search(
        step2, cache2, 2, fused_cfg,
        ctc_log_probs=ctc_lp, ctc_lengths=jnp.asarray([10, 7]),
        lm_step=lm_step, init_lm_cache=lm_cache, vocab_size=30,
    )
    assert np.any(np.asarray(comps1["lm"]) != 0.0)
    recon = (
        0.7 * np.asarray(comps1["att"])
        + 0.3 * np.asarray(comps1["ctc"])
        + 0.5 * np.asarray(comps1["lm"])
    )
    s = np.asarray(scores1)
    finite = s > -1e8
    np.testing.assert_allclose(recon[finite], s[finite], rtol=1e-4, atol=1e-4)
