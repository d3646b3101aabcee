"""Dataset builders (Kaldi, VAD folder), decoder variants, serving pipeline."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_wav(path, audio, rate=16000):
    from scipy.io import wavfile

    wavfile.write(path, rate, (audio * 32767).astype(np.int16))


@pytest.fixture(scope="module")
def kaldi_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kaldi")
    rng = np.random.default_rng(0)
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    long_audio = rng.standard_normal(32000).astype(np.float32) * 0.1
    _write_wav(str(wav_dir / "rec1.wav"), long_audio)
    short = rng.standard_normal(8000).astype(np.float32) * 0.1
    _write_wav(str(wav_dir / "rec2.wav"), short)
    (root / "wav.scp").write_text(
        f"rec1 {wav_dir}/rec1.wav\nrec2 {wav_dir}/rec2.wav\n"
    )
    (root / "segments").write_text(
        "utt1 rec1 0.0 1.0\nutt2 rec1 1.0 2.0\nutt3 rec2 0.0 0.5\n"
    )
    (root / "text").write_text("utt1 hello world\nutt2 test case\nutt3 more text\n")
    return str(root)


def test_kaldi_builder(kaldi_dir):
    from huggingface_asr_tpu.data.builders import iter_kaldi_examples

    examples = list(iter_kaldi_examples(kaldi_dir))
    assert len(examples) == 3
    assert examples[0]["id"] == "utt1"
    assert examples[0]["text"] == "hello world"
    assert abs(examples[0]["input_len"] - 1.0) < 1e-6
    assert len(examples[0]["audio"]) == 16000


def test_kaldi_builder_no_segments(tmp_path):
    from huggingface_asr_tpu.data.builders import iter_kaldi_examples

    rng = np.random.default_rng(1)
    _write_wav(str(tmp_path / "a.wav"), rng.standard_normal(4000) * 0.1)
    (tmp_path / "wav.scp").write_text(f"a {tmp_path}/a.wav\n")
    (tmp_path / "text").write_text("a some words\n")
    examples = list(iter_kaldi_examples(str(tmp_path)))
    assert len(examples) == 1 and examples[0]["text"] == "some words"


def test_energy_vad_segments_speech():
    from huggingface_asr_tpu.data.builders import energy_vad

    rng = np.random.default_rng(2)
    sr = 16000
    audio = np.zeros(sr * 3, np.float32)
    audio += rng.standard_normal(len(audio)).astype(np.float32) * 1e-4  # noise floor
    audio[sr : 2 * sr] += rng.standard_normal(sr).astype(np.float32) * 0.5  # speech
    segs = energy_vad(audio, sr)
    assert len(segs) == 1
    start, end = segs[0]
    assert 0.8 < start < 1.2 and 1.8 < end < 2.4


def test_audio_folder_vad(tmp_path):
    from huggingface_asr_tpu.data.builders import iter_audio_folder_vad

    rng = np.random.default_rng(3)
    sr = 16000
    audio = np.zeros(sr * 2, np.float32) + 1e-4
    audio[sr // 2 : sr] += rng.standard_normal(sr // 2).astype(np.float32) * 0.5
    _write_wav(str(tmp_path / "x.wav"), audio)
    examples = list(iter_audio_folder_vad(str(tmp_path)))
    assert len(examples) == 1
    assert examples[0]["input_len"] > 0.2


def test_audio_folder_vad_custom_segmenter(tmp_path):
    """An external segmenter callable (e.g. a pyannote pipeline) plugs in
    via vad_fn and fully replaces the energy VAD."""
    from huggingface_asr_tpu.data.builders import iter_audio_folder_vad

    sr = 16000
    _write_wav(str(tmp_path / "x.wav"), np.zeros(sr * 2, np.float32))
    calls = []

    def segmenter(audio):
        calls.append(len(audio))
        return [(0.25, 0.75), (1.0, 1.5)]

    examples = list(iter_audio_folder_vad(str(tmp_path), vad_fn=segmenter))
    assert calls == [sr * 2]
    assert len(examples) == 2
    assert abs(examples[0]["input_len"] - 0.5) < 1e-6


def test_decoder_mixing_modes():
    from huggingface_asr_tpu.models.gpt2_decoder import (
        GPT2DecoderConfig,
        GPT2MultiHeadDecoder,
    )

    base = dict(
        vocab_size=20, n_positions=32, n_embd=16, n_layer=2, n_head=2,
        head_locations=(1,), head_weights=(0.5, 0.5), add_cross_attention=False,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 20, (2, 6)), jnp.int32)
    mask = jnp.ones((2, 6), bool)
    for mode in ("full", "linear", "scalar"):
        cfg = GPT2DecoderConfig(**base, mixing_mode=mode)
        dec = GPT2MultiHeadDecoder(cfg)
        params = dec.init(jax.random.key(0), tokens, labels=tokens, label_mask=mask)["params"]
        assert "lm_mixing" in params
        out = dec.apply({"params": params}, tokens, labels=tokens, label_mask=mask)
        assert out.logits.shape == (2, 6, 20)
        assert np.isfinite(float(out.loss))

    # "full" mixing initialized ≈ 0.5-weighted identity average of heads
    cfg = GPT2DecoderConfig(**base, mixing_mode="full")
    dec = GPT2MultiHeadDecoder(cfg)
    params = dec.init(jax.random.key(0), tokens, labels=tokens, label_mask=mask)["params"]
    mixed = dec.apply({"params": params}, tokens, labels=tokens, label_mask=mask)
    manual = 0.5 * (mixed.per_head_logits[0] + mixed.per_head_logits[1])
    np.testing.assert_allclose(
        np.asarray(mixed.logits), np.asarray(manual), rtol=1e-4, atol=1e-5
    )


def test_decoder_residual_head():
    from huggingface_asr_tpu.models.gpt2_decoder import (
        GPT2DecoderConfig,
        GPT2MultiHeadDecoder,
    )

    cfg = GPT2DecoderConfig(
        vocab_size=20, n_positions=32, n_embd=16, n_layer=3, n_head=2,
        connected_residuals=(1, 3), add_cross_attention=False,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    dec = GPT2MultiHeadDecoder(cfg)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 20, (2, 5)), jnp.int32)
    mask = jnp.ones((2, 5), bool)
    params = dec.init(jax.random.key(0), tokens, labels=tokens, label_mask=mask)["params"]
    # head over concat of 2 layers: kernel (2*16, 20)
    assert params["lm_head"]["kernel"].shape == (32, 20)
    out = dec.apply({"params": params}, tokens, labels=tokens, label_mask=mask)
    assert np.isfinite(float(out.loss))


def test_kaldi_builder_piped_wav_scp(tmp_path):
    """Piped wav.scp commands ("cmd |") read WAV bytes from stdout
    (reference kaldi_dataset.py:107-124)."""
    from huggingface_asr_tpu.data.builders import iter_kaldi_examples

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(8000).astype(np.float32) * 0.1
    _write_wav(str(tmp_path / "p.wav"), audio)
    (tmp_path / "wav.scp").write_text(f"p cat {tmp_path}/p.wav |\n")
    (tmp_path / "text").write_text("p piped words\n")
    examples = list(iter_kaldi_examples(str(tmp_path)))
    assert len(examples) == 1
    assert examples[0]["text"] == "piped words"
    got = examples[0]["audio"]
    ref = (audio * 32767).astype(np.int16).astype(np.float32) / 32768.0
    np.testing.assert_allclose(got, ref, atol=1e-6)
