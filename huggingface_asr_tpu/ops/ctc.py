"""CTC loss and greedy decoding, TPU-native.

The loss is a log-semiring forward recursion expressed as a single
``lax.scan`` over time — fully batched, static shapes, fp32 accumulation
(matching the reference's fp32 CTC convention, reference:
src/models/encoders/e_branchformer.py:477-488). Blank index is configurable;
the reference convention is blank = LAST index (vocab logits concatenated
with a separate blank projection, e_branchformer.py:456-457).

Greedy decoding (argmax → collapse repeats → drop blanks) mirrors
reference: src/utilities/eval_utils.py:37-43 but runs as a fused, masked
on-device op; host conversion to ragged token lists is a separate helper.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_EPSILON = -1e9  # "-inf" stand-in that is safe under fp32 arithmetic


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = -1,
    reduction: str = "mean",
    logits_are_log_probs: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Batched CTC loss.

    Args:
      logits: (B, T, V) raw logits (or log-probs if ``logits_are_log_probs``).
      logit_lengths: (B,) valid frame counts.
      labels: (B, L) int32 target ids (no blanks), padded arbitrarily.
      label_lengths: (B,) valid label counts.
      blank_id: blank index; -1 means last (reference convention).
      reduction: "mean" (per-target-length mean, then batch mean — matches
        torch ctc_loss reduction="mean"), "sum", or "none".

    Returns: scalar loss (or (B,) if reduction="none").
    """
    logits = logits.astype(jnp.float32)
    B, T, V = logits.shape
    L = labels.shape[1]
    S = 2 * L + 1
    if blank_id < 0:
        blank_id = V + blank_id

    log_probs = logits if logits_are_log_probs else jax.nn.log_softmax(logits, axis=-1)

    labels = labels.astype(jnp.int32)
    # Extended sequence: blank, l1, blank, l2, ..., blank  — (B, S)
    ext = jnp.full((B, S), blank_id, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(labels)

    # Skip transition s-2 -> s allowed iff ext[s] is a label differing from ext[s-2].
    s_idx = jnp.arange(S)
    is_label = (s_idx % 2) == 1
    prev_label = jnp.pad(labels[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    differs = labels != prev_label  # (B, L): label differs from previous label
    skip_ok = jnp.zeros((B, S), dtype=bool)
    skip_ok = skip_ok.at[:, 1::2].set(differs)
    skip_ok = skip_ok & is_label[None, :] & (s_idx[None, :] >= 2)

    # Per-frame log-probs of the extended symbols: (T, B, S). Computed as an
    # EXACT one-hot contraction instead of take_along_axis: the gather's
    # backward is a (B, T, S) -> (B, T, V) scatter-add, which XLA lowers
    # serially on TPU (measured ~30 ms of the B=64x10 s train step,
    # validation/train_attrib.py r4); the one-hot form is an MXU matmul in
    # BOTH directions. Each row sums exactly one nonzero (1.0 * lp), so the
    # result equals the gather up to the matmul's fp32 accumulation mode.
    onehot = jax.nn.one_hot(ext, V, dtype=log_probs.dtype)  # (B, S, V)
    lp_ext = jax.lax.dot_general(
        log_probs, onehot, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).transpose(1, 0, 2)

    neg_inf = jnp.float32(LOG_EPSILON)
    alpha0 = jnp.full((B, S), neg_inf)
    alpha0 = alpha0.at[:, 0].set(lp_ext[0, :, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, lp_ext[0, :, 1], neg_inf))

    time_idx = jnp.arange(1, T)

    def step(alpha, inp):
        t, lp_t = inp
        a_prev1 = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=LOG_EPSILON)
        a_prev2 = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=LOG_EPSILON)
        a_prev2 = jnp.where(skip_ok, a_prev2, neg_inf)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)
        m = jnp.max(stacked, axis=0)
        new = m + jnp.log(jnp.sum(jnp.exp(stacked - m), axis=0)) + lp_t
        new = jnp.maximum(new, neg_inf)  # keep padding cells finite
        # Frames past this sequence's length: carry alpha unchanged.
        active = (t < logit_lengths)[:, None]
        return jnp.where(active, new, alpha), None

    # unroll: kept as an experiment knob; measured NO train-step gain at
    # unroll=8 on v5e (the 30 ms CTC cost is the gather backward + scan
    # dependency, not loop overhead — validation/train_attrib.py r4), and
    # eager CPU calls with unroll > scan length hit an XLA CPU compile
    # pathology — so the default stays 1.
    alpha, _ = jax.lax.scan(
        step, alpha0, (time_idx, lp_ext[1:]),
        unroll=max(1, min(unroll, T - 1)),
    )

    # Final prob = alpha[2*label_len] (+) alpha[2*label_len - 1]
    last_blank = jnp.take_along_axis(alpha, (2 * label_lengths)[:, None], axis=1)[:, 0]
    gather_lbl = jnp.maximum(2 * label_lengths - 1, 0)
    last_label = jnp.take_along_axis(alpha, gather_lbl[:, None], axis=1)[:, 0]
    last_label = jnp.where(label_lengths > 0, last_label, neg_inf)
    m = jnp.maximum(last_blank, last_label)
    ll = m + jnp.log(jnp.exp(last_blank - m) + jnp.exp(last_label - m))
    per_example = -ll

    if reduction == "none":
        return per_example
    if reduction == "sum":
        return jnp.sum(per_example)
    if reduction == "mean":
        # torch semantics: divide each loss by its target length, then mean.
        return jnp.mean(per_example / jnp.maximum(label_lengths, 1))
    raise ValueError(f"unknown reduction {reduction}")


def ctc_forced_alignment_log_prob(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = -1,
) -> jnp.ndarray:
    """Log P(labels | logits) — convenience wrapper (negative per-example loss)."""
    return -ctc_loss(
        logits, logit_lengths, labels, label_lengths, blank_id=blank_id, reduction="none"
    )


def ctc_greedy_decode(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    blank_id: int = -1,
    pad_id: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused on-device greedy CTC decode.

    Returns (tokens (B, T) left-compacted and padded with ``pad_id``,
    token_lengths (B,)).
    """
    B, T, V = logits.shape
    if blank_id < 0:
        blank_id = V + blank_id
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    prev = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=blank_id)
    valid_t = jnp.arange(T, dtype=jnp.int32)[None, :] < logit_lengths[:, None]
    keep = (ids != blank_id) & (ids != prev) & valid_t

    # Left-compact the kept tokens with a scatter on cumulative positions.
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(keep, pos, T)  # dump dropped tokens past the end
    out = jnp.full((B, T + 1), pad_id, dtype=jnp.int32)
    out = jax.vmap(lambda o, p, v: o.at[p].set(v))(out, pos, ids)
    lengths = jnp.sum(keep.astype(jnp.int32), axis=1)
    return out[:, :T], lengths


def tokens_to_lists(tokens: np.ndarray, lengths: np.ndarray) -> List[List[int]]:
    """Host-side: convert padded (B, T) + lengths into ragged python lists."""
    return [list(map(int, tokens[b, : int(lengths[b])])) for b in range(tokens.shape[0])]
