"""CTC loss parity vs torch.nn.functional.ctc_loss, and greedy-decode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode, ctc_loss, tokens_to_lists

torch = pytest.importorskip("torch")


def _torch_ctc(logits, logit_lens, labels, label_lens, blank, reduction="mean"):
    lp = torch.log_softmax(torch.tensor(logits, dtype=torch.float32), dim=-1)
    return torch.nn.functional.ctc_loss(
        lp.transpose(0, 1),  # (T, B, V)
        torch.tensor(labels),
        torch.tensor(logit_lens),
        torch.tensor(label_lens),
        blank=blank,
        reduction=reduction,
        zero_infinity=True,
    ).item()


@pytest.mark.parametrize("blank_pos", ["last", "zero"])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_ctc_loss_matches_torch(blank_pos, reduction):
    rng = np.random.default_rng(0)
    B, T, V, L = 4, 50, 32, 12
    blank = V - 1 if blank_pos == "last" else 0
    lo = 1 if blank == 0 else 0
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2.0
    labels = rng.integers(lo, V - 1, size=(B, L)).astype(np.int32)
    label_lens = np.array([12, 7, 1, 10], dtype=np.int32)
    logit_lens = np.array([50, 43, 30, 25], dtype=np.int32)

    golden = _torch_ctc(logits, logit_lens, labels, label_lens, blank, reduction)
    ours = float(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(logit_lens),
            jnp.asarray(labels),
            jnp.asarray(label_lens),
            blank_id=blank,
            reduction=reduction,
        )
    )
    assert abs(ours - golden) / max(abs(golden), 1.0) < 1e-4, (ours, golden)


def test_ctc_loss_repeated_labels():
    """Repeats force the blank path — a classic correctness trap."""
    rng = np.random.default_rng(1)
    B, T, V = 2, 30, 10
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = np.array([[3, 3, 3, 5, 5], [2, 2, 0, 0, 0]], dtype=np.int32)
    label_lens = np.array([5, 2], dtype=np.int32)
    logit_lens = np.array([30, 22], dtype=np.int32)
    blank = V - 1
    golden = _torch_ctc(logits, logit_lens, labels, label_lens, blank)
    ours = float(
        ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_lens), jnp.asarray(labels),
            jnp.asarray(label_lens), blank_id=blank,
        )
    )
    assert abs(ours - golden) / max(abs(golden), 1.0) < 1e-4


def test_ctc_loss_grad_matches_torch():
    rng = np.random.default_rng(2)
    B, T, V, L = 2, 20, 8, 5
    blank = V - 1
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = rng.integers(0, V - 1, size=(B, L)).astype(np.int32)
    label_lens = np.array([5, 3], dtype=np.int32)
    logit_lens = np.array([20, 15], dtype=np.int32)

    t_logits = torch.tensor(logits, requires_grad=True)
    lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    loss = torch.nn.functional.ctc_loss(
        lp, torch.tensor(labels), torch.tensor(logit_lens), torch.tensor(label_lens),
        blank=blank, reduction="mean", zero_infinity=True,
    )
    loss.backward()
    golden_grad = t_logits.grad.numpy()

    grad_fn = jax.grad(
        lambda lg: ctc_loss(
            lg, jnp.asarray(logit_lens), jnp.asarray(labels),
            jnp.asarray(label_lens), blank_id=blank,
        )
    )
    ours_grad = np.asarray(grad_fn(jnp.asarray(logits)))
    np.testing.assert_allclose(ours_grad, golden_grad, rtol=1e-3, atol=1e-5)


def test_greedy_decode():
    blank = 4
    # hand-built logits: sequence b a a b b <pad frames>
    seq = [blank, 1, 1, 2, 2, blank, 2]
    V = 5
    logits = np.full((1, len(seq), V), -5.0, dtype=np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 5.0
    toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([6]), blank_id=blank)
    out = tokens_to_lists(np.asarray(toks), np.asarray(lens))
    assert out == [[1, 2]]  # final frame 2 excluded by length mask

    toks, lens = ctc_greedy_decode(jnp.asarray(logits), jnp.asarray([7]), blank_id=blank)
    out = tokens_to_lists(np.asarray(toks), np.asarray(lens))
    assert out == [[1, 2, 2]]  # blank separates the repeated 2


def test_greedy_decode_jit():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((3, 40, 16)).astype(np.float32)
    lens = np.array([40, 30, 10], dtype=np.int32)
    f = jax.jit(lambda lg, ln: ctc_greedy_decode(lg, ln, blank_id=15))
    toks, tlens = f(jnp.asarray(logits), jnp.asarray(lens))
    assert toks.shape == (3, 40)
    assert np.all(np.asarray(tlens) <= lens)
