"""Fused Pallas encoder layer vs the Flax XLA path (interpret mode on CPU).

The mega-kernel (ops/pallas_layer.py) must reproduce the standard bf16 model
at the same padded T: same LN/FF/conv semantics on padding rows, key-masked
attention, and the EXACT factored relative-position math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused

CFG = EBranchformerConfig(
    hidden_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=256,
    conv_dim=(32, 32),
    conv_kernel=(3, 3),
    conv_stride=(2, 2),
    conv_padding=(1, 1),
    csgu_kernel_size=7,
    merge_conv_kernel=7,
    vocab_size=50,
    hidden_dropout=0.0,
    attention_dropout=0.0,
    activation_dropout=0.0,
    csgu_conv_dropout=0.0,
    final_dropout=0.0,
)


def _setup(B=4, T_in=64):
    model = EBranchformerForCTC(CFG, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T_in, 80)), jnp.float32)
    lens = jnp.asarray([T_in, T_in - 8, T_in // 2, T_in - 20], jnp.int32)[:B]
    params = model.init(jax.random.key(0), x, lens)["params"]
    return model, params, x, lens


def test_fused_layer_matches_flax():
    model, params, x, lens = _setup()
    ref = model.apply({"params": params}, x, lens, deterministic=True)
    got = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(got.logit_lengths), np.asarray(ref.logit_lengths)
    )
    r = np.asarray(ref.logits, np.float32)
    g = np.asarray(got.logits, np.float32)
    assert g.shape == r.shape
    # Both paths run bf16 compute with different op orderings; only frames
    # within each utterance's valid length are comparable by contract.
    valid = np.arange(r.shape[1])[None, :] < np.asarray(got.logit_lengths)[:, None]
    diff = np.abs(g - r)[valid]
    scale = np.abs(r[valid]).max()
    assert diff.max() <= 0.05 * max(scale, 1.0), (diff.max(), scale)


@pytest.mark.parametrize("m_mode", ["skip"])
def test_fused_layer_softmax_m_skip_close_to_bitexact(m_mode):
    """SOFTMAX_M_MODE='skip' (static exp2 bound instead of the per-row max
    reduction) is exact softmax modulo bf16 re-rounding of e by a non-
    power-of-two factor 2^(m-BOUND); the fused logits must stay within a
    few bf16 ulps of the rowmax chain."""
    from huggingface_asr_tpu.ops import pallas_layer

    model, params, x, lens = _setup()
    ref = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)
    assert pallas_layer.SOFTMAX_M_MODE == "rowmax"  # module default
    try:
        pallas_layer.SOFTMAX_M_MODE = m_mode
        got = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)
    finally:
        pallas_layer.SOFTMAX_M_MODE = "rowmax"
    r = np.asarray(ref.logits, np.float32)
    g = np.asarray(got.logits, np.float32)
    valid = np.arange(r.shape[1])[None, :] < np.asarray(got.logit_lengths)[:, None]
    diff = np.abs(g - r)[valid]
    scale = np.abs(r[valid]).max()
    assert np.isfinite(g[valid]).all()
    assert diff.max() <= 0.05 * max(scale, 1.0), (diff.max(), scale)


@pytest.mark.parametrize(
    "gelu_mode,z_mode",
    [("fast", "vpu"), ("fastest", "vpu"), ("bitexact", "mxu"),
     ("fastest", "mxu")],
)
def test_fused_layer_numeric_modes_close_to_bitexact(gelu_mode, z_mode):
    """The parity-gated serving numeric modes — GELU_MODE 'fast' (f32
    single-rounding) / 'fastest' (A&S 7.1.27 erfc, |err| <= 5e-4) and
    SOFTMAX_Z_MODE 'mxu' (normalizer from a ones-column of the probs@V
    matmul) — must stay within a few bf16 ulps of the bitexact chain
    through the full fused pipeline."""
    from huggingface_asr_tpu.ops import pallas_layer

    model, params, x, lens = _setup()
    ref = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)
    assert pallas_layer.GELU_MODE == "bitexact"  # module default
    assert pallas_layer.SOFTMAX_Z_MODE == "vpu"  # module default
    try:
        pallas_layer.GELU_MODE = gelu_mode
        pallas_layer.SOFTMAX_Z_MODE = z_mode
        got = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)
    finally:
        pallas_layer.GELU_MODE = "bitexact"
        pallas_layer.SOFTMAX_Z_MODE = "vpu"
    r = np.asarray(ref.logits, np.float32)
    g = np.asarray(got.logits, np.float32)
    valid = np.arange(r.shape[1])[None, :] < np.asarray(got.logit_lengths)[:, None]
    diff = np.abs(g - r)[valid]
    scale = np.abs(r[valid]).max()
    assert diff.max() <= 0.05 * max(scale, 1.0), (diff.max(), scale)


def test_fused_layer_bb1_serving_shape():
    """bb=1 (the serving pipeline's block size) must agree with bb=2."""
    model, params, x, lens = _setup(B=2, T_in=64)
    a = ctc_infer_fused(params, CFG, x, lens, bb=1, interpret=True)
    b = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(a.logits, np.float32),
        np.asarray(b.logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_layer_csgu_linear():
    """csgu_use_linear_after_conv variant matches the Flax path."""
    import dataclasses

    cfg = dataclasses.replace(CFG, csgu_use_linear_after_conv=True,
                              csgu_activation="identity")
    model = EBranchformerForCTC(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 80)), jnp.float32)
    lens = jnp.asarray([64, 40], jnp.int32)
    params = model.init(jax.random.key(0), x, lens)["params"]
    ref = model.apply({"params": params}, x, lens, deterministic=True)
    got = ctc_infer_fused(params, cfg, x, lens, bb=2, interpret=True)
    r = np.asarray(ref.logits, np.float32)
    g = np.asarray(got.logits, np.float32)
    valid = np.arange(r.shape[1])[None, :] < np.asarray(got.logit_lengths)[:, None]
    assert np.abs(g - r)[valid].max() <= 0.05 * max(np.abs(r[valid]).max(), 1.0)


def test_fused_layer_rejects_unsupported():
    import dataclasses

    model, params, x, lens = _setup()
    bad = dataclasses.replace(CFG, position_embeddings_type="rotary")
    with pytest.raises(ValueError):
        ctc_infer_fused(params, bad, x, lens, interpret=True)


def test_fused_layer_swish_hidden_act():
    """hidden_act != gelu: the macaron FFs use the configured activation but
    cgMLP channel_proj1 stays exact-GELU (reference hardcodes nn.GELU there;
    ADVICE r2 medium finding)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, hidden_act="swish")
    model = EBranchformerForCTC(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 80)), jnp.float32)
    lens = jnp.asarray([64, 48], jnp.int32)
    params = model.init(jax.random.key(0), x, lens)["params"]
    ref = model.apply({"params": params}, x, lens, deterministic=True)
    got = ctc_infer_fused(params, cfg, x, lens, bb=2, interpret=True)
    r = np.asarray(ref.logits, np.float32)
    g = np.asarray(got.logits, np.float32)
    valid = np.arange(r.shape[1])[None, :] < np.asarray(got.logit_lengths)[:, None]
    assert np.abs(g - r)[valid].max() <= 0.05 * max(np.abs(r[valid]).max(), 1.0)


def test_fused_layer_t_not_multiple_of_8():
    """T_in chosen so the encoder frame count is NOT a multiple of 8: the
    kernel's T-padding must not leak into valid frames (ADVICE r2: pad rows
    gain FF biases and would bleed through the kernel-31 depthwise convs)."""
    model, params, _, _ = _setup()
    rng = np.random.default_rng(7)
    T_in = 84  # -> 21 encoder frames -> padded to 24 inside the fused path
    x = jnp.asarray(rng.standard_normal((4, T_in, 80)), jnp.float32)
    lens = jnp.asarray([T_in, T_in - 8, T_in // 2, T_in - 20], jnp.int32)
    ref = model.apply({"params": params}, x, lens, deterministic=True)
    got = ctc_infer_fused(params, CFG, x, lens, bb=2, interpret=True)
    assert got.logits.shape == ref.logits.shape
    r = np.asarray(ref.logits, np.float32)
    g = np.asarray(got.logits, np.float32)
    valid = np.arange(r.shape[1])[None, :] < np.asarray(got.logit_lengths)[:, None]
    diff = np.abs(g - r)[valid]
    assert diff.max() <= 0.05 * max(np.abs(r[valid]).max(), 1.0), diff.max()


@pytest.mark.parametrize("gelu_mode", ["bitexact", "fast", "fastest"])
@pytest.mark.parametrize("recip_mode", ["newton", "approx", "off"])
def test_gelu_finite_over_full_bf16_range(gelu_mode, recip_mode):
    """Regression: the A&S erfc rational's p**16 overflows f32 at |x| ~ 18.4
    and the Newton-refined reciprocal turned that inf into NaN
    (r*(2 - inf*r)), which poisoned every bitexact/fast fused decode on
    checkpoints whose GELU pre-activations exceed that (caught by
    validation/fused_mode_check.py on the WER-parity checkpoint). Every
    (GELU_MODE, RECIP_MODE) pair must be finite and limit-correct across
    the representable bf16 range."""
    from functools import partial

    from jax.experimental import pallas as pl
    from huggingface_asr_tpu.ops import pallas_layer

    xs = jnp.asarray(
        [-3e38, -1000.0, -100.0, -30.0, -18.5, -18.0, -5.0, -1.0, 0.0,
         1.0, 5.0, 18.0, 18.5, 30.0, 100.0, 1000.0, 3e38] + [0.0] * 111,
        jnp.bfloat16,
    ).reshape(1, 128)

    def kern(x_ref, o_ref):
        o_ref[...] = pallas_layer.gelu_bf16(x_ref[...])

    try:
        pallas_layer.GELU_MODE = gelu_mode
        pallas_layer.RECIP_MODE = recip_mode
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(xs.shape, jnp.bfloat16),
            interpret=True,
        )(xs)
    finally:
        pallas_layer.GELU_MODE = "bitexact"
        pallas_layer.RECIP_MODE = "newton"
    g = np.asarray(out, np.float32)[0, :17]
    assert np.isfinite(g).all(), (gelu_mode, recip_mode, g)
    # Limits: gelu(x) -> x for large positive x, -> 0 for large negative x.
    x_np = np.asarray(xs, np.float32)[0, :17]
    big_pos = x_np >= 30.0
    np.testing.assert_array_equal(g[big_pos], x_np[big_pos])
    big_neg = x_np <= -30.0
    # arg = -x*sqrt(1/2) > 10.06 there -> erfc tail flushed to exact 0.
    assert (g[big_neg] == 0.0).all(), g[big_neg]
