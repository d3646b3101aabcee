"""Whisper-encoder CTC model tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.whisper_ctc import (
    WhisperCTCConfig,
    WhisperEncoderForCTC,
    whisper_output_lengths,
)

CFG = WhisperCTCConfig(
    d_model=32, encoder_layers=2, encoder_attention_heads=2,
    encoder_ffn_dim=64, vocab_size=40, llm_dim=48, additional_head_count=2,
    max_source_positions=200,
)


def _run(cfg, B=2, T=100):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    lens = jnp.asarray([100, 60])
    model = WhisperEncoderForCTC(cfg)
    labels = jnp.asarray(rng.integers(1, 40, (B, 8)), jnp.int32)
    label_lens = jnp.asarray([8, 5])
    params = model.init(jax.random.key(0), feats, lens, labels=labels,
                        label_lengths=label_lens)["params"]
    out = model.apply({"params": params}, feats, lens, labels=labels,
                      label_lengths=label_lens)
    return model, params, out, lens


def test_shapes_and_loss():
    model, params, out, lens = _run(CFG)
    assert out.logits.shape == (2, 50, 40)
    np.testing.assert_array_equal(
        np.asarray(out.logit_lengths), np.asarray(whisper_output_lengths(CFG, lens))
    )
    assert np.isfinite(float(out.loss))


def test_subsample_variant():
    cfg = WhisperCTCConfig(**{**CFG.__dict__, "sub_sample": True})
    model, params, out, lens = _run(cfg)
    assert out.logits.shape[1] == 13  # 50 -> 25 -> 13
    assert np.isfinite(float(out.loss))


def test_learnable_blank_freezes_vocab_head():
    cfg = WhisperCTCConfig(**{**CFG.__dict__, "learnable_blank_head": True})
    model, params, out, lens = _run(cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 100, 80)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 40, (2, 8)), jnp.int32)

    def loss_fn(p):
        o = model.apply({"params": p}, feats, jnp.asarray([100, 100]),
                        labels=labels, label_lengths=jnp.asarray([8, 8]))
        return o.loss

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["lm_head_frozen_kernel"]).sum()) == 0.0
    assert float(jnp.abs(g["blank_kernel"]).sum()) > 0.0
