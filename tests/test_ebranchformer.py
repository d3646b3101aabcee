"""E-Branchformer model: shapes, masking invariance, causal property, golden parity.

The golden test instantiates the REFERENCE torch model (read-only mount) with
random weights, converts the state dict with our interop tool, and requires
logit agreement — end-to-end architecture + converter validation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import (
    EBranchformerForCTC,
    feat_extract_output_lengths,
)
from huggingface_asr_tpu.interop.hf_ebranchformer import (
    convert_ebranchformer_ctc_state_dict,
)

TINY = EBranchformerConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    conv_dim=(32, 32),
    conv_kernel=(3, 3),
    conv_stride=(2, 2),
    conv_padding=(1, 1),
    vocab_size=50,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    csgu_conv_dropout=0.0,
    final_dropout=0.0,
)


def _init(config, B=2, T=120):
    model = EBranchformerForCTC(config)
    x = jnp.zeros((B, T, config.num_fbanks), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    params = model.init(jax.random.key(0), x, lens)["params"]
    return model, params


def test_shapes_and_lengths():
    model, params = _init(TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
    lens = jnp.asarray([120, 60])
    out = model.apply({"params": params}, x, lens)
    assert out.logits.shape == (2, 30, 51)  # vocab + blank
    np.testing.assert_array_equal(
        np.asarray(out.logit_lengths),
        np.asarray(feat_extract_output_lengths(TINY, lens)),
    )


def test_mask_invariance():
    """Logits over valid frames must not depend on padding content."""
    model, params = _init(TINY)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 80, 80)).astype(np.float32)
    pad_a = np.zeros((1, 40, 80), np.float32)
    pad_b = rng.standard_normal((1, 40, 80)).astype(np.float32) * 10
    la = jnp.asarray([80])
    out_a = model.apply({"params": params}, jnp.asarray(np.concatenate([x, pad_a], 1)), la)
    out_b = model.apply({"params": params}, jnp.asarray(np.concatenate([x, pad_b], 1)), la)
    n = int(out_a.logit_lengths[0])
    # NOTE: conv layers (front end + cgMLP/fusion) leak a few frames of
    # boundary context — same as the reference's torch implementation, which
    # zeroes padding only at encoder entry. Compare the interior.
    interior = n - (TINY.csgu_kernel_size // 2 // 2 + 2)
    np.testing.assert_allclose(
        np.asarray(out_a.logits[0, :interior]),
        np.asarray(out_b.logits[0, :interior]),
        rtol=1e-4,
        atol=1e-4,
    )


def test_ctc_loss_through_model():
    model, params = _init(TINY)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
    lens = jnp.asarray([120, 100])
    labels = jnp.asarray(rng.integers(0, 50, (2, 10)), jnp.int32)
    label_lens = jnp.asarray([10, 6])
    out = model.apply({"params": params}, x, lens, labels=labels, label_lengths=label_lens)
    assert np.isfinite(float(out.loss))


def test_causal_streaming_property():
    """In causal mode, logits at frame t must not depend on future input."""
    cfg = EBranchformerConfig(
        **{**TINY.__dict__, "is_causal": True, "position_embeddings_type": "rotary"}
    )
    model, params = _init(cfg, T=120)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 120, 80)).astype(np.float32)
    y = x.copy()
    y[:, 100:] = rng.standard_normal((1, 20, 80))  # perturb the future
    la = jnp.asarray([120])
    out_x = model.apply({"params": params}, jnp.asarray(x), la)
    out_y = model.apply({"params": params}, jnp.asarray(y), la)
    # 100 input frames -> 25 output frames; everything strictly before is equal
    np.testing.assert_allclose(
        np.asarray(out_x.logits[0, :24]), np.asarray(out_y.logits[0, :24]),
        rtol=1e-4, atol=1e-4,
    )
    assert not np.allclose(np.asarray(out_x.logits[0, 25:]), np.asarray(out_y.logits[0, 25:]))


@pytest.mark.parametrize("pos_type", ["relative", "rotary", "none"])
def test_golden_parity_vs_reference(pos_type):
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    try:
        from models.encoders.e_branchformer import (
            Wav2Vec2EBranchformerConfig,
            Wav2Vec2EBranchformerForCTC,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference model not importable: {e}")

    hf_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32, 32], conv_kernel=[3, 3],
        conv_stride=[2, 2], conv_padding=(1, 1), num_fbanks=80, num_mel_bins=80,
        vocab_size=50, use_fbanks=True, second_dim_input_size=80,
        apply_spec_augment=False, num_feat_extract_layers=2,
        attn_implementation="eager",
        position_embeddings_type=None if pos_type == "none" else pos_type,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        ebranchformer_conv_dropout=0.0,
    )
    torch.manual_seed(0)
    ref = Wav2Vec2EBranchformerForCTC(hf_cfg)
    # HF's _init_weights scales linear_pos to std 0.02, making the
    # positional bd term ~1e-4 at init — too small for this test to
    # discriminate the relative-offset SIGN convention (a mirror-imaged
    # PE[s-t] table passed this test for two rounds). Scale the positional
    # path up to trained-model magnitudes so the convention is asserted.
    if pos_type == "relative":
        with torch.no_grad():
            for lyr in ref.wav2vec2.encoder.layers:
                lyr.self_attn.linear_pos.weight.mul_(20.0)
                lyr.self_attn.pos_bias_u.normal_(std=0.5)
                lyr.self_attn.pos_bias_v.normal_(std=0.5)
    ref.eval()

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 120, 80)).astype(np.float32)
    with torch.no_grad():
        # explicit full mask: the reference trainer always passes one, and
        # with a mask the reference masks attention at its (unpadded-formula)
        # valid length — the convention our model now mirrors.
        golden = ref(
            torch.tensor(x),
            attention_mask=torch.ones(x.shape[:2], dtype=torch.long),
        ).logits.numpy()

    cfg = EBranchformerConfig.from_hf_config(hf_cfg)
    assert cfg.position_embeddings_type == pos_type
    model = EBranchformerForCTC(cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_ebranchformer_ctc_state_dict(sd, cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray([120, 120])
    )
    ours = np.asarray(out.logits)
    assert ours.shape == golden.shape
    # atol 3e-4: the gathered rel-pos contraction reassociates fp32 adds
    # relative to torch's shift-trick order (math identical).
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=3e-4)


@pytest.mark.parametrize("awareness", ["gated", "gated_shared"])
def test_golden_parity_gated_frontends(awareness):
    """Golden parity for the gated / gated_shared conv front ends vs the
    reference ContextAwareConv2d variants (extractors.py:23-66)."""
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from models.encoders.e_branchformer import (
        Wav2Vec2EBranchformerConfig,
        Wav2Vec2EBranchformerForCTC,
    )

    hf_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=128, conv_dim=[16, 16], conv_kernel=[3, 3],
        conv_stride=[2, 2], conv_padding=(1, 1), num_fbanks=80, num_mel_bins=80,
        vocab_size=50, use_fbanks=True, second_dim_input_size=80,
        apply_spec_augment=False, num_feat_extract_layers=2,
        attn_implementation="eager", context_awareness_type=awareness,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        ebranchformer_conv_dropout=0.0,
    )
    torch.manual_seed(0)
    ref = Wav2Vec2EBranchformerForCTC(hf_cfg)
    ref.eval()

    rng = np.random.default_rng(7)
    # T=128 satisfies gated_shared's divisibility (conv time == 4x gate time
    # at both layers); the reference .view() also requires it.
    x = rng.standard_normal((2, 128, 80)).astype(np.float32)
    with torch.no_grad():
        # explicit full mask: the reference trainer always passes one, and
        # with a mask the reference masks attention at its (unpadded-formula)
        # valid length — the convention our model now mirrors.
        golden = ref(
            torch.tensor(x),
            attention_mask=torch.ones(x.shape[:2], dtype=torch.long),
        ).logits.numpy()

    cfg = EBranchformerConfig.from_hf_config(hf_cfg)
    assert cfg.context_awareness_type == awareness
    model = EBranchformerForCTC(cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_ebranchformer_ctc_state_dict(sd, cfg)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray([128, 128]))
    np.testing.assert_allclose(np.asarray(out.logits), golden, rtol=1e-4, atol=3e-4)


def test_relpos_impl_equivalence():
    """gather / shift / factored rel-pos evaluations produce the same logits.

    "factored" is the sinusoid-addition factorization (rotate the
    pos-projected query by -w*t, contract against the ascending table) — an
    exact reformulation, so only fp reassociation error is allowed.
    """
    import dataclasses

    model, params = _init(TINY)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
    lens = jnp.asarray([120, 75])

    outs = {}
    for impl in ("gather", "shift", "factored"):
        cfg = dataclasses.replace(TINY, relpos_impl=impl)
        m = EBranchformerForCTC(cfg)
        outs[impl] = np.asarray(m.apply({"params": params}, x, lens).logits)

    np.testing.assert_allclose(outs["shift"], outs["gather"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["factored"], outs["gather"], rtol=1e-4, atol=2e-4)
