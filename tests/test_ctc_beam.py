"""Frame-synchronous CTC beam search vs exhaustive enumeration golden."""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.decoding.ctc_beam import CTCBeamConfig, ctc_beam_search
from huggingface_asr_tpu.ops.ctc import ctc_loss


def _exact_best(log_probs: np.ndarray, length: int, blank: int, top_n: int):
    """Exact prefix posteriors by enumerating all label sequences."""
    T, V = log_probs.shape
    tokens = [v for v in range(V) if v != blank]
    results = []
    for L in range(0, length + 1):
        for seq in itertools.product(tokens, repeat=L):
            labels = np.zeros((1, max(L, 1)), np.int32)
            if L:
                labels[0, :L] = seq
            ll = -float(
                ctc_loss(
                    jnp.asarray(log_probs[None, :length]),
                    jnp.asarray([length]),
                    jnp.asarray(labels),
                    jnp.asarray([L]),
                    blank_id=blank,
                    reduction="none",
                    logits_are_log_probs=True,
                )[0]
            )
            results.append((ll, seq))
    results.sort(key=lambda x: -x[0])
    return results[:top_n]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_search_finds_exact_best(seed):
    rng = np.random.default_rng(seed)
    T, V, blank = 6, 4, 3
    logits = rng.standard_normal((T, V)).astype(np.float32) * 1.5
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    golden = _exact_best(lp, T, blank, top_n=3)

    # Wide beam: every reachable prefix stays in the beam, so prefix scores
    # are EXACT sums over alignments — validating both recursion and merging.
    tokens, lens, scores = ctc_beam_search(
        jnp.asarray(lp[None]),
        jnp.asarray([T]),
        CTCBeamConfig(beam_size=128, beam_size_token=4, blank_id=blank, max_tokens=8),
    )
    got_best = tuple(int(t) for t in np.asarray(tokens[0, 0])[: int(lens[0, 0])])
    assert got_best == golden[0][1], (got_best, golden[:3])
    assert abs(float(scores[0, 0]) - golden[0][0]) < 1e-3
    # second best should also match (merging correctness)
    got_2 = tuple(int(t) for t in np.asarray(tokens[0, 1])[: int(lens[0, 1])])
    assert got_2 == golden[1][1]
    assert abs(float(scores[0, 1]) - golden[1][0]) < 1e-3


def test_beam_search_batched_lengths():
    rng = np.random.default_rng(3)
    B, T, V, blank = 3, 10, 6, 5
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.array([10, 7, 4], np.int32)

    tokens, lens, scores = ctc_beam_search(
        jnp.asarray(lp), jnp.asarray(lengths),
        CTCBeamConfig(beam_size=4, beam_size_token=6, blank_id=blank, max_tokens=12),
    )
    # each utterance's result must equal decoding it alone (length masking)
    for b in range(B):
        t_solo, l_solo, s_solo = ctc_beam_search(
            jnp.asarray(lp[b : b + 1, : lengths[b]]),
            jnp.asarray([lengths[b]]),
            CTCBeamConfig(beam_size=4, beam_size_token=6, blank_id=blank, max_tokens=12),
        )
        np.testing.assert_allclose(
            np.asarray(scores[b]), np.asarray(s_solo[0]), rtol=1e-5, atol=1e-5
        )
        assert list(np.asarray(tokens[b, 0])[: int(lens[b, 0])]) == list(
            np.asarray(t_solo[0, 0])[: int(l_solo[0, 0])]
        )


def test_beam_search_jit():
    rng = np.random.default_rng(4)
    lp = rng.standard_normal((2, 20, 8)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    f = jax.jit(
        lambda x, l: ctc_beam_search(x, l, CTCBeamConfig(beam_size=4, blank_id=7))
    )
    tokens, lens, scores = f(jnp.asarray(lp), jnp.asarray([20, 15]))
    assert tokens.shape[:2] == (2, 4)
    assert np.all(np.isfinite(np.asarray(scores)[:, 0]))
