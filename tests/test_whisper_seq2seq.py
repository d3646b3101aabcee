"""Whisper AED (seq2seq): golden logits vs HF WhisperForConditionalGeneration,
cached-decode consistency, loss, and compiled beam-search generation with
forced/suppressed token handling."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from huggingface_asr_tpu.decoding.beam_search import BeamSearchConfig
from huggingface_asr_tpu.decoding.generate import generate_whisper
from huggingface_asr_tpu.interop.hf_whisper import convert_whisper_seq2seq_state_dict
from huggingface_asr_tpu.models.whisper_seq2seq import (
    WhisperForConditionalGeneration,
    WhisperSeq2SeqConfig,
)


def _hf_model():
    from transformers import WhisperConfig, WhisperForConditionalGeneration as HFWhisper

    hf_cfg = WhisperConfig(
        vocab_size=100, num_mel_bins=80, d_model=32,
        encoder_layers=2, encoder_attention_heads=2, encoder_ffn_dim=64,
        decoder_layers=2, decoder_attention_heads=2, decoder_ffn_dim=64,
        max_source_positions=100, max_target_positions=64,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=3,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    m = HFWhisper(hf_cfg)
    m.eval()
    return m, hf_cfg


@pytest.fixture(scope="module")
def converted():
    ref, hf_cfg = _hf_model()
    cfg = WhisperSeq2SeqConfig.from_hf_config(hf_cfg)
    params = convert_whisper_seq2seq_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg
    )
    return ref, cfg, params


def test_golden_logits(converted):
    ref, cfg, params = converted
    rng = np.random.default_rng(0)
    B, T_mel, L = 2, 200, 7
    # HF whisper expects (B, mel, 3000); use matching short T for both.
    feats = rng.standard_normal((B, T_mel, 80)).astype(np.float32)
    dec_in = rng.integers(4, 99, (B, L)).astype(np.int64)
    dec_in[:, 0] = 1

    with torch.no_grad():
        golden = ref(
            input_features=torch.tensor(feats.transpose(0, 2, 1)),
            decoder_input_ids=torch.tensor(dec_in),
        ).logits.numpy()

    model = WhisperForConditionalGeneration(cfg)
    enc_hidden, enc_lengths = model.apply(
        {"params": params}, jnp.asarray(feats), method=model.encode
    )
    from huggingface_asr_tpu.models.whisper_seq2seq import WhisperDecoder

    dec = WhisperDecoder(cfg)
    ours = dec.apply(
        {"params": params["decoder"]},
        jnp.asarray(dec_in, jnp.int32),
        encoder_hidden=enc_hidden,
        encoder_lengths=enc_lengths,
    )
    np.testing.assert_allclose(np.asarray(ours), golden, rtol=2e-4, atol=2e-4)


def test_loss_teacher_forcing(converted):
    _, cfg, params = converted
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 200, 80)).astype(np.float32)
    labels = rng.integers(4, 99, (2, 6)).astype(np.int32)
    model = WhisperForConditionalGeneration(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(feats),
        labels=jnp.asarray(labels),
        label_lengths=jnp.asarray([6, 4]),
    )
    assert np.isfinite(float(out.loss))
    # roughly log(V) at random init
    assert 2.0 < float(out.loss) < 8.0


def test_generate_with_forced_and_suppressed(converted):
    _, cfg, params = converted
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2, 200, 80)).astype(np.float32)
    model = WhisperForConditionalGeneration(cfg)

    bs_cfg = BeamSearchConfig(
        num_beams=2, max_length=10, ctc_weight=0.0, num_candidates=8,
        bos_token_id=cfg.decoder_start_token_id,
        eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
    )
    seqs, scores = jax.jit(
        lambda p, f: generate_whisper(
            model, p, f, jnp.asarray([200, 150]), bs_cfg,
            forced_decoder_ids=((1, 42), (2, 17)),
            suppress_tokens=(50, 51),
            begin_suppress_tokens=(60,),
        )
    )(params, jnp.asarray(feats))
    seqs = np.asarray(seqs)
    assert seqs.shape[:2] == (2, 2)
    # forced prompt: generation positions 1,2 (indices 1,2 after bos)
    assert (seqs[:, 0, 1] == 42).all()
    assert (seqs[:, 0, 2] == 17).all()
    # suppressed ids never appear
    assert not np.isin(seqs, [50, 51]).any()
    assert np.isfinite(np.asarray(scores)).all()


def test_cached_decode_matches_full_forward(converted):
    """Step-by-step KV-cached decoding == one full teacher-forced pass."""
    _, cfg, params = converted
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 200, 80)).astype(np.float32)
    toks = np.array([[1, 42, 17, 9, 5]], np.int32)
    model = WhisperForConditionalGeneration(cfg)
    enc_hidden, enc_lengths = model.apply(
        {"params": params}, jnp.asarray(feats), method=model.encode
    )
    from huggingface_asr_tpu.decoding.generate import build_whisper_decoder_step
    from huggingface_asr_tpu.models.whisper_seq2seq import WhisperDecoder

    full = WhisperDecoder(cfg).apply(
        {"params": params["decoder"]}, jnp.asarray(toks),
        encoder_hidden=enc_hidden, encoder_lengths=enc_lengths,
    )
    step, cache = build_whisper_decoder_step(
        model, params["decoder"], enc_hidden, enc_lengths, max_length=8
    )
    for t in range(toks.shape[1]):
        logits, cache = step(
            cache, jnp.asarray(toks[:, t : t + 1]), jnp.asarray([t])
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, t]), rtol=2e-4, atol=2e-4
        )
