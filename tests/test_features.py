"""Parity tests: our fused log-mel front end vs the HF Speech2Text extractor.

The reference's CustomFeatureExtractor (reference:
src/utilities/feature_extractors.py:14-61) is a thin subclass of HF
``Speech2TextFeatureExtractor``; with torchaudio absent, HF computes the
Kaldi-compatible numpy path, which is our golden reference here.
"""

import numpy as np
import pytest

from huggingface_asr_tpu.ops.features import (
    LogMelConfig,
    LogMelFrontEnd,
    kaldi_mel_filter_bank,
    povey_window,
)

transformers = pytest.importorskip("transformers")
from transformers import Speech2TextFeatureExtractor  # noqa: E402
from transformers.audio_utils import mel_filter_bank, window_function  # noqa: E402


def _rand_audio(rng, n):
    # Speech-like: band-limited noise, bounded to [-1, 1].
    x = rng.standard_normal(n).astype(np.float32)
    x = np.convolve(x, np.ones(8) / 8.0, mode="same")
    return np.clip(x, -1.0, 1.0)


def test_povey_window_matches_hf():
    ours = povey_window(400)
    hf = window_function(400, "povey", periodic=False)
    np.testing.assert_allclose(ours, hf, rtol=1e-12, atol=1e-12)


def test_mel_filter_bank_matches_hf():
    ours = kaldi_mel_filter_bank(257, 80, 20.0, 8000.0, 16000)
    hf = mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=80,
        min_frequency=20,
        max_frequency=8000,
        sampling_rate=16000,
        norm=None,
        mel_scale="kaldi",
        triangularize_in_mel_space=True,
    )
    np.testing.assert_allclose(ours, hf, rtol=1e-8, atol=1e-10)


def test_log_mel_parity_raw():
    rng = np.random.default_rng(0)
    audio = _rand_audio(rng, 16000)  # 1 s
    fe_hf = Speech2TextFeatureExtractor(do_ceptral_normalize=False)
    golden = fe_hf(audio, sampling_rate=16000, padding=False, return_tensors="np")[
        "input_features"
    ][0]

    fe = LogMelFrontEnd(LogMelConfig(norm_type="none"))
    ours, lens = fe(audio[None], np.array([len(audio)]))
    ours = np.asarray(ours[0])

    assert golden.shape == ours.shape, (golden.shape, ours.shape)
    assert int(lens[0]) == golden.shape[0]
    # fp32 matmul-DFT vs HF's float64 FFT. Near-silent bins suffer fp32
    # cancellation that log() amplifies, so compare in the power domain with
    # a floor proportional to the utterance's peak mel energy.
    ours_pow, gold_pow = np.exp(ours), np.exp(golden)
    rel = np.abs(ours_pow - gold_pow) / (gold_pow + 1e-5 * gold_pow.max())
    assert rel.max() < 5e-3, rel.max()
    # In the log domain the overwhelming majority of bins agree tightly.
    err = np.abs(ours - golden)
    assert np.quantile(err, 0.99) < 1e-2
    assert err.mean() < 2e-3


def test_log_mel_parity_utterance_cmvn():
    rng = np.random.default_rng(0)
    audio = _rand_audio(rng, 16000)
    fe_hf = Speech2TextFeatureExtractor(do_ceptral_normalize=True)
    golden = fe_hf(audio, sampling_rate=16000, padding=False, return_tensors="np")[
        "input_features"
    ][0]
    fe = LogMelFrontEnd(LogMelConfig(norm_type="utterance"))
    ours, _ = fe(audio[None], np.array([len(audio)]))
    ours = np.asarray(ours[0])
    err = np.abs(ours - golden)
    assert np.quantile(err, 0.99) < 2e-2
    assert err.mean() < 3e-3


def test_log_mel_batched_padding_invariance():
    """Features of a short utterance must not change when batch-padded."""
    rng = np.random.default_rng(1)
    a = _rand_audio(rng, 8000)
    b = _rand_audio(rng, 16000)
    fe = LogMelFrontEnd(LogMelConfig())

    solo, solo_len = fe(a[None], np.array([8000]))
    batch = np.zeros((2, 16000), dtype=np.float32)
    batch[0, :8000] = a
    batch[1] = b
    both, lens = fe(batch, np.array([8000, 16000]))

    n = int(solo_len[0])
    assert int(lens[0]) == n
    np.testing.assert_allclose(np.asarray(both[0, :n]), np.asarray(solo[0]), rtol=1e-4, atol=1e-4)
    # padding region zeroed
    assert np.all(np.asarray(both[0, n:]) == 0.0)


def test_global_norm():
    rng = np.random.default_rng(2)
    a = _rand_audio(rng, 16000)
    means = rng.standard_normal(80).astype(np.float32)
    stds = (1.0 + rng.random(80)).astype(np.float32)

    raw = LogMelFrontEnd(LogMelConfig(norm_type="none"))
    glob = LogMelFrontEnd(
        LogMelConfig(norm_type="global"), global_means=means, global_stds=stds
    )
    r, _ = raw(a[None], np.array([16000]))
    g, _ = glob(a[None], np.array([16000]))
    np.testing.assert_allclose(
        np.asarray(g[0]), (np.asarray(r[0]) - means) / stds, rtol=1e-5, atol=1e-5
    )


def test_jit_compiles():
    import jax

    fe = LogMelFrontEnd(LogMelConfig())
    f = jax.jit(fe.__call__)
    x = np.zeros((2, 4000), dtype=np.float32)
    x[:, 100] = 0.5
    feats, lens = f(x, np.array([4000, 2000]))
    assert feats.shape == (2, 23, 80)
    assert list(np.asarray(lens)) == [23, 11]
