"""Golden parity: our GPT-2 multi-head decoder vs the reference torch decoder
via checkpoint conversion (covers GPT-2 blocks, cross-attention, aux heads,
logit averaging, and fixed-position/scaled-embedding variants)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from huggingface_asr_tpu.interop.hf_decred import convert_gpt2_decoder_state_dict
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig, GPT2MultiHeadDecoder


def _reference_decoder(average_logits=False):
    from models.decoders.multi_head_gpt2 import GPT2MultiHeadConfig, GPT2LMMultiHeadModel

    cfg = GPT2MultiHeadConfig(
        vocab_size=50, n_positions=64, n_embd=32, n_layer=3, n_head=2,
        n_inner=64, add_cross_attention=True, head_locations=[1],
        head_weights=[0.4, 0.6], average_logits=average_logits, lsm_factor=0.0,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        tie_word_embeddings=False, attn_implementation="eager",
        bos_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(0)
    model = GPT2LMMultiHeadModel(cfg)
    model.eval()
    return model, cfg


@pytest.mark.parametrize("average_logits", [False, True])
def test_decoder_logits_parity(average_logits):
    ref, hf_cfg = _reference_decoder(average_logits)
    rng = np.random.default_rng(0)
    B, T, S = 2, 7, 9
    tokens = rng.integers(0, 50, (B, T))
    enc_hidden = rng.standard_normal((B, S, 32)).astype(np.float32)

    with torch.no_grad():
        golden = ref(
            torch.tensor(tokens),
            encoder_hidden_states=torch.tensor(enc_hidden),
        ).logits.numpy()

    cfg = GPT2DecoderConfig(
        vocab_size=50, n_positions=64, n_embd=32, n_layer=3, n_head=2,
        n_inner=64, add_cross_attention=True, head_locations=(1,),
        head_weights=(0.4, 0.6), average_logits=average_logits,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    dec = GPT2MultiHeadDecoder(cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_gpt2_decoder_state_dict(sd, cfg)
    out = dec.apply(
        {"params": params},
        jnp.asarray(tokens, jnp.int32),
        encoder_hidden=jnp.asarray(enc_hidden),
        encoder_lengths=jnp.asarray([S, S]),
    )
    np.testing.assert_allclose(np.asarray(out.logits), golden, rtol=2e-4, atol=2e-4)


def test_decoder_loss_is_consistent_teacher_forcing():
    """Our loss must equal the per-head weighted CE of the CONVERTED model's
    own logits against aligned targets — i.e., the consistent next-token
    objective. (The reference's custom-decoder loss pathway double-shifts —
    shift_tokens_right outside + logits[:-1]/labels[1:] inside,
    multi_head_gpt2.py:149-153 — which is off-by-one w.r.t. generation for
    any label convention; verified empirically by training its tiny decoder
    to zero loss and observing skip-gram generation. We deliberately do not
    replicate that quirk.)"""
    ref, _ = _reference_decoder()
    rng = np.random.default_rng(1)
    B, T, S = 2, 7, 5
    y = np.concatenate(
        [rng.integers(4, 50, (B, T - 1)), np.ones((B, 1), np.int64)], axis=1
    )
    inputs = np.concatenate([np.zeros((B, 1), np.int64), y[:, :-1]], axis=1)
    enc_hidden = rng.standard_normal((B, S, 32)).astype(np.float32)

    cfg = GPT2DecoderConfig(
        vocab_size=50, n_positions=64, n_embd=32, n_layer=3, n_head=2,
        n_inner=64, add_cross_attention=True, head_locations=(1,),
        head_weights=(0.4, 0.6), resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    dec = GPT2MultiHeadDecoder(cfg)
    params = convert_gpt2_decoder_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg
    )
    out = dec.apply(
        {"params": params},
        jnp.asarray(inputs, jnp.int32),
        encoder_hidden=jnp.asarray(enc_hidden),
        encoder_lengths=jnp.asarray([S, S]),
        labels=jnp.asarray(y, jnp.int32),
        label_mask=jnp.ones((B, T), bool),
    )
    # manual golden: weighted sum over heads of CE(head_logits, y)
    golden = 0.0
    for lg, w in zip(out.per_head_logits, (0.4, 0.6)):
        logp = jax.nn.log_softmax(np.asarray(lg, np.float64), axis=-1)
        nll = -np.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        golden += w * nll.mean()
    assert abs(float(out.loss) - golden) / golden < 1e-5, (float(out.loss), golden)
