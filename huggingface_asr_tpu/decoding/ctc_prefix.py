"""Batched CTC prefix scoring for joint CTC/attention decoding — TPU-native.

Re-derivation of the vectorized ESPnet algorithm (Watanabe et al. hybrid
CTC/attention, Alg. 2; Seki et al. 2019 vectorized beam search) that the
reference wraps as ``CTCPrefixScoreTH`` (reference:
src/decoding/ctc_scorer.py:7-256). Differences are structural, not
mathematical:

  * The per-frame Python loop (reference :148-151) becomes a ``lax.scan``
    over time with the prefix-probability accumulator folded into the SAME
    scan (the reference materializes log_phi_x over all T and reduces after).
  * Scoring is over a per-beam CANDIDATE set (the reference's
    ``scoring_ids`` partial mode, :94-100) so the transient forward tensor is
    (T, 2, BW, K) instead of (T, 2, BW, V) — on TPU this is what keeps the
    state in HBM bounds for vocab ~5k.
  * Everything is static-shape; variable input lengths are handled by the
    same x-preparation trick as the reference (frames past xlen get
    log-prob 0 for blank, logzero elsewhere, :38-41) so the scan needs no
    dynamic bounds.

State layout: r (T, 2, BW) forward probs of the CURRENT prefix (n: ends with
non-blank, b: ends with blank), s (BW,) prefix score, last (BW,) last token.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

LOG_ZERO = -1.0e10


def _lse2(a, b):
    # epsilon guard: deep semiring products can push both args far below
    # LOG_ZERO; log(0) would mint a true -inf and NaN-poison downstream.
    m = jnp.maximum(jnp.maximum(a, b), LOG_ZERO)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + 1e-38)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, LOG_ZERO))
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m) + 1e-38)


def _forward_assoc(r0_n, r0_b, xk, xb, phi):
    """CTC forward recursion via a log-semiring associative scan.

    Per frame t (1-indexed relative to the r0 state):
        rn[t] = lse(rn[t-1], phi[t-1]) + xk[t]
        rb[t] = lse(rn[t-1], rb[t-1]) + xb[t]
    is the affine semiring map  u_t = M_t ⊗ u_{t-1}  with augmented
    u = [rn, rb, 0] and structured M (third row constant [-inf,-inf,0],
    M[0][1] = -inf). The closure of such matrices has 5 free entries
    (A, C, D, E, F):
        [[A, -inf, C], [D, E, F], [-inf, -inf, 0]]
    composed (later Y ∘ earlier X) as:
        A=YA+XA, C=lse(YA+XC, YC), D=lse(YD+XA, YE+XD), E=YE+XE,
        F=lse3(YD+XC, YE+XF, YF).
    Returns (rn_seq, rb_seq) of shape (T-1, BW, K) matching the lax.scan path.
    """
    xbb = xb[:, :, None]  # (T-1, BW, 1)
    A = xk  # (T-1, BW, K)
    C = phi + xk
    D = jnp.broadcast_to(xbb, xk.shape)
    E = jnp.broadcast_to(xbb, xk.shape)
    F = jnp.full_like(xk, LOG_ZERO)

    def combine(x, y):
        XA, XC, XD, XE, XF = x
        YA, YC, YD, YE, YF = y
        return (
            YA + XA,
            _lse2(YA + XC, YC),
            _lse2(YD + XA, YE + XD),
            YE + XE,
            _lse3(YD + XC, YE + XF, YF),
        )

    PA, PC, PD, PE, PF = jax.lax.associative_scan(combine, (A, C, D, E, F), axis=0)
    rn_seq = _lse2(PA + r0_n[None], PC)
    rb_seq = _lse3(PD + r0_n[None], PE + r0_b[None], PF)
    return rn_seq, rb_seq


class CTCPrefixState(NamedTuple):
    r: jnp.ndarray  # (T, 2, BW) forward probs for current prefixes
    s: jnp.ndarray  # (BW,) prefix scores log P_ctc(prefix)
    last: jnp.ndarray  # (BW,) last emitted token id
    length: jnp.ndarray  # (BW,) prefix length (tokens after sos)


class CTCPrefixScorer:
    """Holds the prepared CTC log-posteriors; pure-functional step methods.

    ``impl`` selects the forward-recursion evaluation:
      * "assoc" (default): log-semiring ASSOCIATIVE scan — the coupled
        (r^n, r^b) recurrence is an affine map in the (logsumexp, +)
        semiring, so prefix products of structured 3×3 matrices evaluate it
        in O(log T) depth. ~4× more arithmetic than the sequential scan but
        ~15× lower latency on TPU, where the per-step tensors are tiny and
        the 250-step sequential chain is dispatch-bound.
      * "scan": the direct sequential ``lax.scan`` (reference shape).
    """

    def __init__(
        self,
        ctc_log_probs: jnp.ndarray,  # (B, T, V) log-softmaxed encoder logits
        lengths: jnp.ndarray,  # (B,)
        blank_id: int,
        eos_id: int,
        impl: str = "assoc",
    ):
        self.impl = impl
        B, T, V = ctc_log_probs.shape
        self.batch, self.input_length, self.odim = B, T, V
        self.blank_id, self.eos_id = blank_id, eos_id

        t_idx = jnp.arange(T)[None, :]
        valid = t_idx < lengths[:, None]  # (B, T)
        x = jnp.where(valid[..., None], ctc_log_probs.astype(jnp.float32), LOG_ZERO)
        blank_col = jnp.where(valid, ctc_log_probs[..., blank_id].astype(jnp.float32), 0.0)
        x = x.at[..., blank_id].set(blank_col)
        self.xn = x.transpose(1, 0, 2)  # (T, B, V) token log-probs
        self.xb = blank_col.transpose(1, 0)  # (T, B) blank log-probs

    def init_state(self, num_hyps: int) -> CTCPrefixState:
        """State for BW = batch * num_hyps empty prefixes."""
        B, T = self.batch, self.input_length
        BW = B * num_hyps
        # r_b[t] = cumulative blank prob (empty prefix survives via blanks).
        r = jnp.full((T, 2, BW), LOG_ZERO, dtype=jnp.float32)
        cum_blank = jnp.cumsum(self.xb, axis=0)  # (T, B)
        r = r.at[:, 1, :].set(jnp.repeat(cum_blank, num_hyps, axis=1))
        return CTCPrefixState(
            r=r,
            s=jnp.zeros((BW,), jnp.float32),
            last=jnp.full((BW,), -1, jnp.int32),
            length=jnp.zeros((BW,), jnp.int32),
        )

    def score_candidates(
        self, state: CTCPrefixState, candidate_ids: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Score extending each prefix with each candidate token.

        candidate_ids: (BW, K) token ids.
        Returns (token_scores (BW, K) = log psi - s_prev,
                 r_new (T, 2, BW, K) forward probs per candidate).
        """
        T, B, V = self.input_length, self.batch, self.odim
        BW, K = candidate_ids.shape
        n_hyps = BW // B

        # Gather per-candidate token log-probs: (T, BW, K) via ONE fused
        # gather on flattened (batch, vocab) indices — materializing the
        # (T, BW, V) expansion first costs ~GBs of HBM traffic per step.
        batch_of = jnp.repeat(jnp.arange(B), n_hyps)  # (BW,)
        flat_idx = (batch_of[:, None] * V + candidate_ids).reshape(-1)  # (BW*K,)
        xk = self.xn.reshape(T, B * V)[:, flat_idx].reshape(T, BW, K)
        xb_bh = self.xb[:, batch_of]  # (T, BW)

        # log_phi[t, i, k]: prob of prefix at frame t allowing the candidate
        # to start at t+1. When candidate == last token, only blank-ending
        # paths extend (CTC repeat rule).
        r_sum = jax.nn.logsumexp(state.r, axis=1)  # (T, BW)
        is_repeat = candidate_ids == state.last[:, None]  # (BW, K)
        log_phi = jnp.where(
            is_repeat[None], state.r[:, 1, :, None], r_sum[:, :, None]
        )  # (T, BW, K)

        # First frame: candidate emitted at t=0 only for the empty prefix.
        empty = (state.length == 0)[:, None]  # (BW, 1)
        r0_n = jnp.where(empty, xk[0], LOG_ZERO)  # (T=0 row), (BW, K)
        r0_b = jnp.full_like(r0_n, LOG_ZERO)

        def lse2(a, b):
            m = jnp.maximum(a, b)
            m = jnp.maximum(m, LOG_ZERO)  # keep -inf arithmetic finite
            return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))

        if self.impl == "assoc":
            rn_seq, rb_seq = _forward_assoc(
                r0_n, r0_b, xk[1:], xb_bh[1:], log_phi[:-1]
            )
            grow = log_phi[:-1] + xk[1:]  # (T-1, BW, K)
            psi = lse2(
                jax.nn.logsumexp(jnp.maximum(grow, LOG_ZERO), axis=0), r0_n
            )
        else:
            def step(carry, inputs):
                rn_prev, rb_prev, psi_acc = carry
                xk_t, xb_t, phi_prev = inputs  # (BW,K),(BW,),(BW,K)
                grow = phi_prev + xk_t  # candidate emitted at frame t
                rn = lse2(rn_prev, phi_prev) + xk_t
                rb = lse2(rn_prev, rb_prev) + xb_t[:, None]
                psi = lse2(psi_acc, grow)
                return (rn, rb, psi), (rn, rb)

            (rn_T, rb_T, psi), (rn_seq, rb_seq) = jax.lax.scan(
                step,
                (r0_n, r0_b, r0_n),  # psi starts with the t=0 emission term
                (xk[1:], xb_bh[1:], log_phi[:-1]),
            )
        # Assemble r_new: (T, 2, BW, K)
        rn_full = jnp.concatenate([r0_n[None], rn_seq], axis=0)
        rb_full = jnp.concatenate([r0_b[None], rb_seq], axis=0)
        r_new = jnp.stack([rn_full, rb_full], axis=1)

        log_psi = psi
        # Blank can never extend a prefix as a label.
        log_psi = jnp.where(candidate_ids == self.blank_id, LOG_ZERO, log_psi)
        token_scores = log_psi - state.s[:, None]
        return token_scores, (r_new, log_psi)

    def extended(
        self, ctc_log_probs: jnp.ndarray, lengths: jnp.ndarray
    ) -> "CTCPrefixScorer":
        """Streaming: a scorer over the OLD frames + a NEW posterior chunk
        (reference ``extend_prob``, ctc_scorer.py:209-229). Prepared tensors
        concatenate exactly: frames past each chunk's length are blank=0 /
        logzero, the same padding the reference inserts mid-stream."""
        new = CTCPrefixScorer(ctc_log_probs, lengths, self.blank_id, self.eos_id,
                              impl=self.impl)
        assert new.batch == self.batch and new.odim == self.odim
        merged = CTCPrefixScorer.__new__(CTCPrefixScorer)
        merged.impl = self.impl
        merged.batch, merged.odim = self.batch, self.odim
        merged.blank_id, merged.eos_id = self.blank_id, self.eos_id
        merged.input_length = self.input_length + new.input_length
        merged.xn = jnp.concatenate([self.xn, new.xn], axis=0)
        merged.xb = jnp.concatenate([self.xb, new.xb], axis=0)
        return merged

    def extend_state(self, state: CTCPrefixState, old_T: int) -> CTCPrefixState:
        """Continue a prefix state's forward variables into new frames —
        CHEAP APPROXIMATION (cost O(T_new)):

            rn[t] = rn[t-1] + x_t[last]   (re-emission collapses repeats)
            rb[t] = lse(rn[t-1], rb[t-1]) + x_t[blank]

        This keeps strictly more probability mass than the reference/ESPnet
        ``extend_state`` (ctc_scorer.py:240-256, blank row only) but still
        drops paths where the prefix's LAST label is first emitted inside the
        new frames (exactness would need the parent prefix's forward vars —
        the whole ancestor chain). Use ``replay_state`` for the exact
        continuation at O(L·T) cost.
        """
        T_total = self.input_length
        T_new = T_total - old_T
        BW = state.r.shape[2]
        n_hyps = BW // self.batch
        batch_of = jnp.repeat(jnp.arange(self.batch), n_hyps)  # (BW,)

        xb_new = self.xb[old_T:, batch_of]  # (T_new, BW)
        safe_last = jnp.clip(state.last, 0, self.odim - 1)
        x_last = self.xn[old_T:, batch_of, safe_last]  # (T_new, BW)
        x_last = jnp.where(state.last[None, :] >= 0, x_last, LOG_ZERO)

        def step(carry, inputs):
            rn_prev, rb_prev = carry
            xl_t, xb_t = inputs
            rn = rn_prev + xl_t
            rb = _lse2(rn_prev, rb_prev) + xb_t
            return (rn, rb), (rn, rb)

        (rn_T, rb_T), (rn_seq, rb_seq) = jax.lax.scan(
            step, (state.r[old_T - 1, 0], state.r[old_T - 1, 1]),
            (x_last, xb_new),
        )
        r_ext = jnp.stack([rn_seq, rb_seq], axis=1)  # (T_new, 2, BW)
        return CTCPrefixState(
            r=jnp.concatenate([state.r, r_ext], axis=0),
            s=state.s,
            last=state.last,
            length=state.length,
        )

    def replay_state(
        self, tokens: jnp.ndarray, lengths: jnp.ndarray, num_hyps: int
    ) -> CTCPrefixState:
        """EXACT streaming state: rebuild each prefix's forward variables over
        ALL frames of this (extended) scorer by replaying its tokens.

        tokens: (BW, L) prefix token ids (pad arbitrary past lengths).
        lengths: (BW,) prefix lengths. Cost O(L·T) — the exact counterpart of
        ``extend_state`` for chunked joint decoding.
        """
        state = self.init_state(num_hyps)
        BW, L = tokens.shape
        beam_idx = jnp.arange(BW)
        for step in range(L):
            tok = tokens[:, step]
            _, scored = self.score_candidates(state, tok[:, None])
            new_state = self.select_state(
                state, scored, beam_idx, jnp.zeros((BW,), jnp.int32), tok
            )
            alive = (step < lengths)
            state = CTCPrefixState(
                r=jnp.where(alive[None, None, :], new_state.r, state.r),
                s=jnp.where(alive, new_state.s, state.s),
                last=jnp.where(alive, new_state.last, state.last),
                length=jnp.where(alive, new_state.length, state.length),
            )
        return state

    def select_state(
        self,
        state: CTCPrefixState,
        scored: Tuple[jnp.ndarray, jnp.ndarray],
        beam_idx: jnp.ndarray,  # (BW,) index into previous BW hypotheses
        cand_idx: jnp.ndarray,  # (BW,) index into K candidates of that hyp
        new_tokens: jnp.ndarray,  # (BW,) chosen token ids
    ) -> CTCPrefixState:
        """Reorder/advance state after beam selection (reference :180-207)."""
        r_new, log_psi = scored
        r = r_new[:, :, beam_idx, :]  # (T, 2, BW, K)
        r = jnp.take_along_axis(
            r, cand_idx[None, None, :, None], axis=3
        )[..., 0]  # (T, 2, BW)
        s = log_psi[beam_idx, cand_idx]
        length = state.length[beam_idx] + 1
        return CTCPrefixState(r=r, s=s, last=new_tokens, length=length)
