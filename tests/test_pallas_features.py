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
