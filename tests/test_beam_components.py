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


@pytest.mark.parametrize("length_penalty", [1.0, 0.6])
def test_early_exit_matches_full_scan(length_penalty):
    """early_exit while_loop must return IDENTICAL sequences/scores to the
    full max_length scan (conservative is_done bound) on a decoder that
    strongly prefers eos after step 2, i.e. where the exit actually fires."""
    import dataclasses as dc

    # Synthetic decoder_step with a strong eos preference after step 2 so the
    # search genuinely finishes early; cache carries the step counter.
    V = 30
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((8, V)).astype(np.float32)) * 2.0

    def fake_step(cache, tokens, positions):
        t = cache["t"]
        logits = table[jnp.minimum(t, 7)][None, :].repeat(tokens.shape[0], axis=0)
        eos_boost = jnp.where(t >= 2, 10.0, -10.0)
        logits = logits.at[:, 1].add(eos_boost)
        return logits, {"t": t + 1, "steps": cache["steps"] + 1}

    cfg = BeamSearchConfig(
        num_beams=3, max_length=24, ctc_weight=0.0, num_candidates=8,
        length_penalty=length_penalty, early_exit=True,
    )
    cache0 = {"t": jnp.zeros((), jnp.int32), "steps": jnp.zeros((), jnp.int32)}

    seqs_e, scores_e = jax.jit(
        lambda c: joint_beam_search(fake_step, c, 2, cfg, vocab_size=V)
    )(cache0)
    cfg_full = dc.replace(cfg, early_exit=False)
    seqs_f, scores_f = jax.jit(
        lambda c: joint_beam_search(fake_step, c, 2, cfg_full, vocab_size=V)
    )(cache0)

    np.testing.assert_array_equal(np.asarray(seqs_e), np.asarray(seqs_f))
    np.testing.assert_allclose(np.asarray(scores_e), np.asarray(scores_f), rtol=1e-6)


def test_early_exit_with_ctc_matches_full_scan():
    """Same equivalence through the real decoder + CTC prefix scorer path."""
    import dataclasses as dc

    step, cache, ctc_lp, _ = _setup(max_len=16)
    cfg = BeamSearchConfig(
        num_beams=2, max_length=16, ctc_weight=0.3, num_candidates=8,
        length_penalty=1.0, early_exit=True,
    )
    seqs_e, scores_e = joint_beam_search(
        step, cache, 2, cfg,
        ctc_log_probs=ctc_lp, ctc_lengths=jnp.asarray([10, 7]), vocab_size=30,
    )
    step2, cache2, _, _ = _setup(max_len=16)
    seqs_f, scores_f = joint_beam_search(
        step2, cache2, 2, dc.replace(cfg, early_exit=False),
        ctc_log_probs=ctc_lp, ctc_lengths=jnp.asarray([10, 7]), vocab_size=30,
    )
    np.testing.assert_array_equal(np.asarray(seqs_e), np.asarray(seqs_f))
    np.testing.assert_allclose(np.asarray(scores_e), np.asarray(scores_f), rtol=1e-6)


def test_eos_space_trick_parity():
    """Our candidate-set eos-space trick must reproduce the reference
    CTCRescorerLogitsProcessor's full-vocab trick (ctc_scorer.py:333-349)
    when the candidate set is the full vocab."""
    import sys

    torch = pytest.importorskip("torch")
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from decoding.ctc_scorer import CTCRescorerLogitsProcessor

    from huggingface_asr_tpu.decoding.beam_search import (
        apply_eos_space_trick_scores,
    )

    rng = np.random.default_rng(7)
    B, W, V, T = 1, 2, 8, 16
    eos, blank = 1, V - 1  # reference uses pad_token_id as the CTC blank
    ctc_w = 0.3
    enc_logits = torch.tensor(
        rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    )
    enc_lens = torch.tensor([T], dtype=torch.long)
    input_ids = torch.zeros((B * W, 1), dtype=torch.long)

    def make_ref(trick_on, space_id, weight):
        return CTCRescorerLogitsProcessor(
            enc_logits.clone(), enc_lens.clone(), blank, eos, 0, ctc_w, W,
            space_id, trick_on, weight,
        )

    # probe: recover the scorer's per-row CTC scores to engineer the conflict
    flat_att = torch.log_softmax(
        torch.tensor(rng.standard_normal((B * W, V)).astype(np.float32)),
        dim=-1,
    )
    probe = make_ref(False, 0, 1.0)
    probe_out = probe(input_ids, flat_att.clone())
    logzero = probe.ctc_prefix_scorer.logzero
    att_sup = flat_att.clone()
    att_sup[:, blank] = logzero
    ctc_scores = (probe_out - (1 - ctc_w) * att_sup) / ctc_w
    space_id = int(ctc_scores[0].argmax())
    assert space_id != eos, "pick another seed: ctc argmax collides with eos"

    # engineer att: argmax is EOS, but by a margin small enough that CTC's
    # preference for space flips the mixture
    ctc_gap = float(ctc_scores[0, space_id] - ctc_scores[0, eos])
    assert ctc_gap > 0
    att_gap = 0.5 * ctc_w / (1 - ctc_w) * ctc_gap
    att = torch.full((B * W, V), -3.0)
    att[:, eos] = -3.0 + att_gap
    att = torch.log_softmax(att, dim=-1)
    att_s = att.clone()
    att_s[:, blank] = logzero
    comb = (1 - ctc_w) * att_s + ctc_w * ctc_scores
    c_eos, c_space = float(comb[0, eos]), float(comb[0, space_id])
    assert c_eos < c_space < 0
    weight = 0.9 * c_space / c_eos
    assert 0 < weight < 1

    out_on = make_ref(True, space_id, weight)(input_ids, att.clone())
    out_off = make_ref(False, space_id, weight)(input_ids, att.clone())
    fired_rows = (out_on != out_off).any(dim=1)
    assert bool(fired_rows[0]), "trick must fire in the engineered row"

    # our formulation on the same numbers, candidate set = full vocab
    cand_ids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (B * W, V))
    got = apply_eos_space_trick_scores(
        jnp.asarray(out_off.numpy()),
        cand_ids,
        jnp.asarray(att_s.numpy()),
        jnp.asarray(ctc_scores.numpy()),
        eos_token_id=eos,
        space_token_id=space_id,
        weight=float(weight),
    )
    np.testing.assert_allclose(
        np.asarray(got), out_on.numpy(), rtol=1e-5, atol=1e-5
    )


def test_ctc_margin_inert_matches_reference_behavior():
    """ctc_margin>0 must decode IDENTICALLY to margin=0: the reference's own
    generate() path never activates windowing (ctc_scorer.py:127 requires
    att_w, which CTCRescorerLogitsProcessor.__call__ :331 never passes), so
    margin is inert there and must be inert — not an error — here."""
    step, cache, ctc_lp, _ = _setup()
    seqs = {}
    for margin in (0, 5):
        cfg = BeamSearchConfig(
            num_beams=2, max_length=8, ctc_weight=0.3, num_candidates=8,
            ctc_margin=margin,
        )
        s, sc = joint_beam_search(
            step, cache, 2, cfg,
            ctc_log_probs=ctc_lp, ctc_lengths=jnp.asarray([10, 7]),
            vocab_size=30,
        )
        seqs[margin] = (np.asarray(s), np.asarray(sc))
    np.testing.assert_array_equal(seqs[0][0], seqs[5][0])
    np.testing.assert_allclose(seqs[0][1], seqs[5][1], rtol=1e-6)
