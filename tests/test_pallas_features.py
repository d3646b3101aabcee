"""Pallas fused mel front end vs the XLA front end (interpret mode on CPU).

The DC-removal/pre-emphasis fold into the DFT bases is exact in exact
arithmetic, so features must agree to fp tolerance, including CMVN and
padding behavior for ragged lengths.
"""

import numpy as np

import jax.numpy as jnp

from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
from huggingface_asr_tpu.ops.pallas_features import PallasLogMelFrontEnd


def _run(norm_type):
    cfg = LogMelConfig(norm_type=norm_type)
    ref = LogMelFrontEnd(cfg)
    fused = PallasLogMelFrontEnd(cfg, interpret=True)

    rng = np.random.default_rng(0)
    B, S = 2, 16000 * 2  # 2 s
    wav = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    lens = jnp.asarray([S, S - 5000], jnp.int32)

    f_ref, l_ref = ref(wav, lens)
    f_got, l_got = fused(wav, lens)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_got))
    assert f_got.shape == f_ref.shape
    r, g = np.asarray(f_ref), np.asarray(f_got)
    np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_pallas_mel_utterance_cmvn():
    _run("utterance")


def test_pallas_mel_no_norm():
    _run("none")


def test_pallas_mel_hop_row_layout_matches_flat():
    """The (B, rows, hop) fast-path layout must equal the (B, S) path."""
    cfg = LogMelConfig()
    fused = PallasLogMelFrontEnd(cfg, interpret=True)
    rng = np.random.default_rng(1)
    B, S = 2, 16000 * 2
    wav = rng.standard_normal((B, S)).astype(np.float32) * 0.1
    lens = jnp.asarray([S, S - 4000], jnp.int32)

    f_flat, l_flat = fused(jnp.asarray(wav), lens)

    rows = fused.rows_alloc(S)
    hop = cfg.hop_length
    padded = np.zeros((B, rows * hop), np.float32)
    padded[:, :S] = wav
    f_rows, l_rows = fused(
        jnp.asarray(padded.reshape(B, rows, hop)), lens, num_samples=S
    )
    np.testing.assert_array_equal(np.asarray(l_flat), np.asarray(l_rows))
    np.testing.assert_allclose(
        np.asarray(f_rows), np.asarray(f_flat), rtol=0, atol=0
    )


def test_pallas_mel_fused_cmvn_bf16_matches_xla_cmvn():
    """The serving configuration (in-kernel CMVN + bf16 output) must equal
    the XLA-CMVN path rounded to bf16, including the zeroed padding rows."""
    cfg = LogMelConfig(norm_type="utterance")
    ref = LogMelFrontEnd(cfg)
    fused = PallasLogMelFrontEnd(cfg, interpret=True, fused_cmvn_bf16=True)

    rng = np.random.default_rng(3)
    B, S = 2, 16000 * 2
    wav = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    lens = jnp.asarray([S, S - 5000], jnp.int32)

    f_ref, l_ref = ref(wav, lens)
    f_got, l_got = fused(wav, lens)
    assert f_got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_got))
    g = np.asarray(f_got, np.float32)
    r = np.asarray(f_ref.astype(jnp.bfloat16), np.float32)
    # same values after one bf16 rounding (kernel CMVN is fp32, same op
    # order; bf16 resolution ~ 2^-8 relative)
    np.testing.assert_allclose(g, r, rtol=0, atol=2e-2)
    # padding rows are exact zeros (conv front-end contract)
    n1 = int(np.asarray(l_got)[1])
    assert np.all(g[1, n1:] == 0.0)


def test_pallas_mel_high_precision_close_to_highest():
    """Manual 3-pass 'high' mode stays within ~1e-2 of the fp32 features
    (bf16 hi/lo split drops only the lo*lo term)."""
    cfg_hi = LogMelConfig()
    cfg_h = LogMelConfig(matmul_precision="high")
    rng = np.random.default_rng(2)
    B, S = 2, 16000
    wav = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    f_ref, _ = PallasLogMelFrontEnd(cfg_hi, interpret=True)(wav)
    f_got, _ = PallasLogMelFrontEnd(cfg_h, interpret=True)(wav)
    np.testing.assert_allclose(
        np.asarray(f_got), np.asarray(f_ref), rtol=0, atol=2e-2
    )


def test_pallas_mel_bf16_precision_bounded():
    """Single-pass 'bf16' DFT mode (serving candidate, transcript-gated by
    validation/fused_mode_check.py): post-CMVN features stay within ~0.2
    absolute of the fp32 features. CMVN normalizes variance to 1, so 0.2 is
    0.2 sigma — coarse, which is exactly why the mode ships only behind the
    transcript-identity gate."""
    cfg_hi = LogMelConfig()
    cfg_b = LogMelConfig(matmul_precision="bf16")
    rng = np.random.default_rng(3)
    B, S = 2, 16000
    wav = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
    f_ref, _ = PallasLogMelFrontEnd(cfg_hi, interpret=True)(wav)
    f_got, _ = PallasLogMelFrontEnd(cfg_b, interpret=True)(wav)
    np.testing.assert_allclose(
        np.asarray(f_got), np.asarray(f_ref), rtol=0, atol=0.2
    )
    # and it must be a real approximation, not a broken path
    assert float(np.abs(np.asarray(f_got) - np.asarray(f_ref)).mean()) < 0.02
