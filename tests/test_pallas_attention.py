"""Fused rel-pos attention kernel: interpret-mode parity vs XLA math, and
model-level equivalence when the pallas path is enabled."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.ops.pallas_attention import (
    rel_attention,
    rel_attention_reference,
)


def test_kernel_matches_reference_math():
    rng = np.random.default_rng(0)
    B, T, H, dh = 2, 64, 2, 16
    args = [jnp.asarray(rng.standard_normal((B, T, H, dh)), jnp.float32)
            for _ in range(4)]
    pos = jnp.asarray(rng.standard_normal((2 * T - 1, H, dh)), jnp.float32)
    lengths = jnp.asarray([64, 40])
    ref = rel_attention_reference(*args, pos, lengths)
    ours = rel_attention(*args, pos, lengths, interpret=True)
    for b, L in enumerate([64, 40]):
        np.testing.assert_allclose(
            np.asarray(ours[b, :L]), np.asarray(ref[b, :L]), rtol=1e-5, atol=1e-5
        )


def test_model_level_equivalence(monkeypatch):
    """EBranchformerForCTC with attention_impl=pallas (interpret) == xla."""
    import huggingface_asr_tpu.ops.pallas_attention as pa
    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC

    # interpret-mode on CPU for the test
    orig = pa.rel_attention
    monkeypatch.setattr(
        pa, "rel_attention",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )

    base = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(8, 8), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=20,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        csgu_conv_dropout=0.0, final_dropout=0.0,
    )
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((2, 80, 80)), jnp.float32)
    lens = jnp.asarray([80, 60])

    m_xla = EBranchformerForCTC(EBranchformerConfig(**base, attention_impl="xla"))
    params = m_xla.init(jax.random.key(0), feats, lens)["params"]
    out_xla = m_xla.apply({"params": params}, feats, lens)

    m_pl = EBranchformerForCTC(EBranchformerConfig(**base, attention_impl="pallas"))
    out_pl = m_pl.apply({"params": params}, feats, lens)

    n = int(out_xla.logit_lengths[1])
    np.testing.assert_allclose(
        np.asarray(out_pl.logits[:, :n]), np.asarray(out_xla.logits[:, :n]),
        rtol=2e-4, atol=2e-4,
    )
