"""Batched, jit-compiled joint CTC/attention beam search with shallow fusion.

TPU-native re-design of the reference decode stack — HF ``generate()`` beam
search + ``CTCRescorerLogitsProcessor`` + ``LMRescorerLogitsProcessor``
(reference: src/models/ctc_encoder_plus_autoregressive_decoder.py:360-482,
src/decoding/ctc_scorer.py:259-354, src/decoding/shallow_fussion.py:5-53):

    next_token_score = (1 - ctc_weight) * log_softmax(att)
                       + ctc_weight * ctc_prefix_score
                       + lm_weight * log_softmax(lm)

The whole search is ONE compiled program: a ``lax.scan`` over decode steps,
KV-cached decoder (and LM) steps, per-beam candidate top-K, CTC prefix
scoring as an inner time-scan, and alive/finished beam bookkeeping with HF's
length-penalty convention (score = sum_logprobs / len(hyp)**penalty, hyp
including the start token). Per-hypothesis score components (att/ctc/lm) are
tracked through beam reordering — the reference recovers these post-hoc from
beam-search internals for n-best dumps (generation_utils.py:115-126); here
they are first-class outputs.

Departure from the reference (documented): CTC scores are computed for the
attention top-K candidates per beam (the reference's partial-scoring mode,
ctc_scorer.py:94-100) rather than the full vocab, bounding the transient
state to (T, 2, BW, K); K defaults to 64 and is configurable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.decoding.ctc_prefix import CTCPrefixScorer, CTCPrefixState

NEG_INF = -1.0e9


@dataclasses.dataclass(frozen=True)
class BeamSearchConfig:
    num_beams: int = 5
    max_length: int = 128
    ctc_weight: float = 0.3
    ctc_margin: int = 0  # accepted + inert, matching the reference generate()
                         # path (ctc_scorer.py:127,331: windowing needs att_w,
                         # which is never passed) — any value decodes identically
    lm_weight: float = 0.0
    length_penalty: float = 1.0
    num_candidates: int = 64  # per-beam att top-K scored by CTC
    bos_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 3
    blank_id: int = -1  # index into CTC logits; -1 = last
    # eos-space trick (reference ctc_scorer.py:333-349)
    apply_eos_space_trick: bool = False
    space_token_id: int = -1
    eos_space_trick_weight: float = 1.0
    return_components: bool = False  # also return att/ctc/lm score breakdown
    # Stop decoding once every batch element is provably done (HF
    # stopping-criteria analogue): finished set full AND no alive beam can
    # still beat the worst finished score under the length penalty. Saves
    # most of the wall-clock on short utterances (the scan otherwise always
    # runs max_length-1 steps). Result-identical to the full scan (tested).
    early_exit: bool = True
    # Candidate preselection over the (BW, V) scores with TPU-native
    # approx_max_k (exact top_k sorts and dominates the step at vocab ≥ 5k).
    approx_candidate_topk: bool = True
    approx_topk_recall: float = 0.99


def apply_eos_space_trick_scores(
    combined: jnp.ndarray,   # (BW, K) mixed candidate scores
    cand_ids: jnp.ndarray,   # (BW, K) token ids of the candidates
    cand_att: jnp.ndarray,   # (BW, K) attention log-probs at the candidates
    cand_ctc: jnp.ndarray,   # (BW, K) CTC prefix scores at the candidates
    *,
    eos_token_id: int,
    space_token_id: int,
    weight: float,
) -> jnp.ndarray:
    """Reference eos-space trick (ctc_scorer.py:333-349) over a candidate set.

    Per beam row: when attention's best token is EOS but CTC's best is space,
    and the mixed EOS score loses to space while ``weight * eos`` would win,
    multiply the mixed EOS score by ``weight`` (log-domain boost for
    weight < 1, scores being negative log-probs).

    The reference takes argmaxes over the FULL vocab; here they run over the
    candidate set. EOS is always a candidate (appended column), so the
    att-argmax clause matches whenever it can matter; if space falls outside
    the att top-K preselection the trick cannot fire — but then space cannot
    be selected either, which is the scenario the trick exists to prevent.
    Exact-parity is asserted against the reference implementation at K=V in
    tests/test_beam_components.py::test_eos_space_trick_parity.
    """
    att_argmax = jnp.take_along_axis(
        cand_ids, jnp.argmax(cand_att, axis=1)[:, None], axis=1
    )[:, 0]
    ctc_argmax = jnp.take_along_axis(
        cand_ids, jnp.argmax(cand_ctc, axis=1)[:, None], axis=1
    )[:, 0]
    is_eos_col = cand_ids == eos_token_id
    eos_score = jnp.where(is_eos_col, combined, NEG_INF).max(axis=1)
    space_col = cand_ids == space_token_id
    space_score = jnp.where(space_col, combined, NEG_INF).max(axis=1)
    conflict = (
        (att_argmax == eos_token_id)
        & (ctc_argmax == space_token_id)
        & (eos_score < space_score)
        & (weight * eos_score > space_score)
    )
    return jnp.where(
        conflict[:, None] & is_eos_col, combined * weight, combined
    )


class _BeamState(NamedTuple):
    step: jnp.ndarray
    alive_tokens: jnp.ndarray  # (B, W, L)
    alive_scores: jnp.ndarray  # (B, W) combined sum of log-probs
    alive_components: jnp.ndarray  # (B, W, 3) cumulative [att, ctc, lm]
    cache: Any  # decoder KV cache, leaves (B*W, ...)
    lm_cache: Any
    ctc_state: Optional[CTCPrefixState]
    finished_tokens: jnp.ndarray  # (B, W, L)
    finished_scores: jnp.ndarray  # (B, W) length-penalized
    finished_components: jnp.ndarray  # (B, W, 3)
    finished_mask: jnp.ndarray  # (B, W) slot filled
    done: jnp.ndarray  # (B,) HF is_done: batch frozen (no further updates)


def _gather_beams(tree, beam_idx_flat):
    """Reorder (B*W, ...) pytree leaves by flat beam indices.

    Encoder K/V caches ("cached_enc_*") are identical across the beams of a
    batch element (beam indices only permute within a batch group), so
    gathering them would be a large no-op copy — skip them.
    """

    def visit(path, x):
        if any("cached_enc" in str(getattr(k, "key", k)) for k in path):
            return x
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == beam_idx_flat.shape[0]:
            return x[beam_idx_flat]
        return x

    return jax.tree_util.tree_map_with_path(visit, tree)


def joint_beam_search(
    decoder_step: Callable[[Any, jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, Any]],
    init_cache: Any,
    batch_size: int,
    config: BeamSearchConfig,
    ctc_log_probs: Optional[jnp.ndarray] = None,  # (B, T, V+1)
    ctc_lengths: Optional[jnp.ndarray] = None,
    lm_step: Optional[Callable] = None,
    init_lm_cache: Any = None,
    vocab_size: Optional[int] = None,
):
    """Run beam search.

    decoder_step(cache, tokens (BW,1), positions (BW,)) -> (logits (BW,V), cache)
    Returns (sequences (B, W, L) sorted best-first incl. bos, scores (B, W))
    plus a components dict {"att","ctc","lm"} of (B, W) arrays when
    ``config.return_components``.
    """
    cfg = config
    # ctc_margin is accepted and IGNORED — exactly the reference's shipped
    # behavior: CTCPrefixScoreTH only windows when attention weights are
    # passed (ctc_scorer.py:127 `att_w is not None and self.margin > 0`),
    # and CTCRescorerLogitsProcessor.__call__ never passes att_w
    # (ctc_scorer.py:331 `self.ctc_prefix_scorer(input_ids, self.ctc_states)`),
    # so margin>0 is inert in the reference's generate() path too. Full-T
    # scoring here is therefore bit-for-bit the same recursion the reference
    # runs at ANY margin value, and reference decode configs that set a
    # margin run unchanged.
    B, W, K = batch_size, cfg.num_beams, cfg.num_candidates
    L = cfg.max_length
    BW = B * W

    use_ctc = cfg.ctc_weight > 0.0 and ctc_log_probs is not None
    use_lm = lm_step is not None and cfg.lm_weight != 0.0
    scorer = None
    if use_ctc:
        V_ctc = ctc_log_probs.shape[-1]
        blank = cfg.blank_id % V_ctc
        scorer = CTCPrefixScorer(ctc_log_probs, ctc_lengths, blank, cfg.eos_token_id)
        vocab_size = vocab_size or V_ctc - 1

    alive_tokens = jnp.full((B, W, L), cfg.pad_token_id, jnp.int32)
    alive_tokens = alive_tokens.at[:, :, 0].set(cfg.bos_token_id)
    alive_scores = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (W - 1), jnp.float32)[None], (B, 1)
    )

    state = _BeamState(
        step=jnp.zeros((), jnp.int32),
        alive_tokens=alive_tokens,
        alive_scores=alive_scores,
        alive_components=jnp.zeros((B, W, 3), jnp.float32),
        cache=init_cache,
        lm_cache=init_lm_cache,
        ctc_state=scorer.init_state(W) if use_ctc else None,
        finished_tokens=jnp.full((B, W, L), cfg.pad_token_id, jnp.int32),
        finished_scores=jnp.full((B, W), NEG_INF, jnp.float32),
        finished_components=jnp.zeros((B, W, 3), jnp.float32),
        finished_mask=jnp.zeros((B, W), bool),
        done=jnp.zeros((B,), bool),
    )

    def one_step(state: _BeamState, _):
        t = state.step
        last_tokens = jax.lax.dynamic_slice_in_dim(
            state.alive_tokens.reshape(BW, L), t, 1, axis=1
        )  # (BW, 1)
        positions = jnp.full((BW,), t, jnp.int32)

        logits, new_cache = decoder_step(state.cache, last_tokens, positions)
        att = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (BW, V)
        if vocab_size is not None and att.shape[-1] > vocab_size:
            att = att[:, :vocab_size]
        V = att.shape[-1]
        # Suppress pad (reference CTCRescorer :325 zeroes pad always).
        att = att.at[:, cfg.pad_token_id].set(NEG_INF)

        new_lm_cache = state.lm_cache
        lm_lp = None
        select_scores = att
        if use_lm:
            lm_logits, new_lm_cache = lm_step(state.lm_cache, last_tokens, positions)
            lm_lp = jax.nn.log_softmax(lm_logits.astype(jnp.float32), axis=-1)[:, :V]
            select_scores = att + cfg.lm_weight * lm_lp

        # Per-beam candidates = top-(K-1) of the non-CTC score ∪ {eos}.
        if cfg.approx_candidate_topk:
            top_sel, cand_ids = jax.lax.approx_max_k(
                select_scores, K - 1, recall_target=cfg.approx_topk_recall
            )
            cand_ids = cand_ids.astype(jnp.int32)
        else:
            top_sel, cand_ids = jax.lax.top_k(select_scores, K - 1)
        has_eos = jnp.any(cand_ids == cfg.eos_token_id, axis=-1, keepdims=True)
        eos_col = jnp.full((BW, 1), cfg.eos_token_id, jnp.int32)
        cand_ids = jnp.concatenate([cand_ids, eos_col], axis=1)  # (BW, K)

        cand_att = jnp.take_along_axis(att, cand_ids, axis=1)
        cand_lm = (
            jnp.take_along_axis(lm_lp, cand_ids, axis=1)
            if use_lm
            else jnp.zeros_like(cand_att)
        )
        # de-duplicate the appended eos column
        dup = jnp.concatenate(
            [jnp.zeros((BW, K - 1), bool), has_eos], axis=1
        )
        cand_att = jnp.where(dup, NEG_INF, cand_att)

        if use_ctc:
            cand_ctc, scored = scorer.score_candidates(state.ctc_state, cand_ids)
            combined = (
                (1.0 - cfg.ctc_weight) * cand_att
                + cfg.ctc_weight * cand_ctc
                + cfg.lm_weight * cand_lm
            )
            if cfg.apply_eos_space_trick:
                combined = apply_eos_space_trick_scores(
                    combined, cand_ids, cand_att, cand_ctc,
                    eos_token_id=cfg.eos_token_id,
                    space_token_id=cfg.space_token_id,
                    weight=cfg.eos_space_trick_weight,
                )
        else:
            cand_ctc = jnp.zeros_like(cand_att)
            combined = cand_att + cfg.lm_weight * cand_lm
            scored = None

        total = state.alive_scores.reshape(BW, 1) + combined  # (BW, K)
        total_b = total.reshape(B, W * K)

        # Top 2W candidates so EOS picks don't starve the alive set.
        top_scores, top_idx = jax.lax.top_k(total_b, 2 * W)  # (B, 2W)
        beam_of = top_idx // K  # (B, 2W) source beam within batch
        cand_of = top_idx % K

        def gather_cand(x):  # x: (BW, K) -> (B, 2W) at (beam_of, cand_of)
            return jnp.take_along_axis(
                jnp.take_along_axis(x.reshape(B, W, K), beam_of[..., None], axis=1),
                cand_of[..., None],
                axis=2,
            )[..., 0]

        tok_of = gather_cand(cand_ids)
        comp_of = jnp.stack(
            [gather_cand(cand_att), gather_cand(cand_ctc), gather_cand(cand_lm)],
            axis=-1,
        )  # (B, 2W, 3)
        src_components = jnp.take_along_axis(
            state.alive_components, beam_of[..., None], axis=1
        )
        new_components = src_components + comp_of
        is_eos = tok_of == cfg.eos_token_id

        # ----- update finished set with EOS candidates.
        # HF BeamSearchScorer.process semantics, replicated exactly:
        #   * only eos candidates ranked < num_beams among the 2W enter the
        #     finished set (`if beam_token_rank >= self.group_size: continue`)
        #   * the length-penalty denominator is input_ids.shape[-1] at add()
        #     time = bos + generated tokens, EXCLUDING the eos itself = t+1.
        rank_lt_w = jnp.arange(2 * W)[None, :] < W
        eos_eligible = is_eos & rank_lt_w
        lp_len = (t + 1).astype(jnp.float32)  # HF cur_len: bos + generated
        fin_cand_scores = jnp.where(
            eos_eligible, top_scores / (lp_len ** cfg.length_penalty), NEG_INF
        )
        src_tokens = jnp.take_along_axis(
            state.alive_tokens, beam_of[..., None], axis=1
        )  # (B, 2W, L)
        onehot_t1 = (jnp.arange(L) == (t + 1))[None, None, :]
        fin_cand_tokens = jnp.where(onehot_t1, cfg.eos_token_id, src_tokens)
        all_fin_scores = jnp.concatenate([state.finished_scores, fin_cand_scores], axis=1)
        all_fin_tokens = jnp.concatenate([state.finished_tokens, fin_cand_tokens], axis=1)
        all_fin_components = jnp.concatenate(
            [state.finished_components, new_components], axis=1
        )
        all_fin_mask = jnp.concatenate([state.finished_mask, eos_eligible], axis=1)
        fin_top, fin_idx = jax.lax.top_k(
            jnp.where(all_fin_mask, all_fin_scores, NEG_INF), W
        )
        new_finished_tokens = jnp.take_along_axis(all_fin_tokens, fin_idx[..., None], axis=1)
        new_finished_components = jnp.take_along_axis(
            all_fin_components, fin_idx[..., None], axis=1
        )
        new_finished_mask = jnp.take_along_axis(all_fin_mask, fin_idx, axis=1)

        # ----- new alive set: best W non-EOS candidates
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        alv_top, alv_idx = jax.lax.top_k(alive_cand_scores, W)  # (B, W)
        alv_beam = jnp.take_along_axis(beam_of, alv_idx, axis=1)  # (B, W)
        alv_cand = jnp.take_along_axis(cand_of, alv_idx, axis=1)
        alv_tok = jnp.take_along_axis(tok_of, alv_idx, axis=1)
        alv_components = jnp.take_along_axis(
            new_components, alv_idx[..., None], axis=1
        )

        new_alive_tokens = jnp.where(
            onehot_t1,
            alv_tok[..., None],
            jnp.take_along_axis(state.alive_tokens, alv_beam[..., None], axis=1),
        )

        beam_flat = (jnp.arange(B)[:, None] * W + alv_beam).reshape(BW)
        new_cache = _gather_beams(new_cache, beam_flat)
        if use_lm:
            new_lm_cache = _gather_beams(new_lm_cache, beam_flat)

        new_ctc_state = state.ctc_state
        if use_ctc:
            new_ctc_state = scorer.select_state(
                state.ctc_state,
                scored,
                beam_flat,
                alv_cand.reshape(BW),
                alv_tok.reshape(BW),
            )

        # HF is_done (early_stopping=False): finished set full AND the worst
        # finished score >= the best attainable continuation, where HF's
        # attainable bound is best_next_candidate_sum / cur_len**penalty with
        # cur_len = t+1 (BeamHypotheses.is_done). Once done, the batch is
        # FROZEN (HF process() skips done batches) — later, better finishes
        # must NOT be taken, or results diverge from the reference.
        best_next = jnp.max(top_scores, axis=1)  # (B,)
        worst_fin = jnp.min(
            jnp.where(new_finished_mask, fin_top, NEG_INF), axis=1
        )
        done_now = jnp.all(new_finished_mask, axis=1) & (
            worst_fin >= best_next / (lp_len ** cfg.length_penalty)
        )
        frozen = state.done  # done at ENTRY: this step's updates are void

        def keep(old, new):
            d = frozen.reshape((B,) + (1,) * (new.ndim - 1))
            return jnp.where(d, old, new)

        new_state = _BeamState(
            step=t + 1,
            alive_tokens=keep(state.alive_tokens, new_alive_tokens),
            alive_scores=keep(state.alive_scores, alv_top),
            alive_components=keep(state.alive_components, alv_components),
            cache=new_cache,
            lm_cache=new_lm_cache,
            ctc_state=new_ctc_state,
            finished_tokens=keep(state.finished_tokens, new_finished_tokens),
            finished_scores=keep(state.finished_scores, fin_top),
            finished_components=keep(
                state.finished_components, new_finished_components
            ),
            finished_mask=keep(state.finished_mask, new_finished_mask),
            done=state.done | done_now,
        )
        return new_state, None

    if cfg.early_exit:
        # done-freezing makes the while_loop RESULT-IDENTICAL to the full
        # scan: once every batch is done (HF is_done), further steps are
        # no-ops, so skipping them saves wall-clock only.
        state = jax.lax.while_loop(
            lambda s: (s.step < L - 1) & ~jnp.all(s.done),
            lambda s: one_step(s, None)[0],
            state,
        )
    else:
        state, _ = jax.lax.scan(one_step, state, None, length=L - 1)

    # Finalize: fold still-alive beams in for batches with open slots (HF
    # finalize skips done batches entirely — their alive beams are stale).
    alive_final = jnp.where(
        state.done[:, None],
        NEG_INF,
        state.alive_scores / (jnp.float32(L) ** cfg.length_penalty),
    )
    all_scores = jnp.concatenate(
        [jnp.where(state.finished_mask, state.finished_scores, NEG_INF), alive_final],
        axis=1,
    )
    all_tokens = jnp.concatenate([state.finished_tokens, state.alive_tokens], axis=1)
    all_components = jnp.concatenate(
        [state.finished_components, state.alive_components], axis=1
    )
    top, idx = jax.lax.top_k(all_scores, W)
    sequences = jnp.take_along_axis(all_tokens, idx[..., None], axis=1)
    if cfg.return_components:
        comps = jnp.take_along_axis(all_components, idx[..., None], axis=1)
        components: Dict[str, jnp.ndarray] = {
            "att": comps[..., 0],
            "ctc": comps[..., 1],
            "lm": comps[..., 2],
        }
        return sequences, top, components
    return sequences, top
