"""Data pipeline: text transforms, bucketing, collator."""

import numpy as np
import pytest

from huggingface_asr_tpu.data.bucketing import (
    BucketedBatchSampler,
    BucketingConfig,
    quantize_length,
)
from huggingface_asr_tpu.data.collator import CollatorConfig, FeatureCollator, SpeechCollator
from huggingface_asr_tpu.data.text_transforms import apply_text_transforms


class DummyTokenizer:
    def encode(self, text):
        return [ord(c) % 100 + 1 for c in text]


def test_text_transforms():
    text, keep = apply_text_transforms("Hello, WORLD!  ", ["do_lower_case"], True)
    assert text == "hello, world!  " and keep

    text, keep = apply_text_transforms(
        "Hello, WORLD!",
        ["do_lower_case", "remove_punctuation", "remove_multiple_whitespaces_and_strip"],
        True,
    )
    assert text == "hello world" and keep

    # _train suffix skipped on eval splits
    text, _ = apply_text_transforms("ABC", ["do_lower_case_train"], False)
    assert text == "ABC"
    text, _ = apply_text_transforms("ABC", ["do_lower_case_train"], True)
    assert text == "abc"

    _, keep = apply_text_transforms("", ["filter_empty_transcriptions"], True)
    assert not keep

    text, _ = apply_text_transforms(
        "ok <COMMA> next", ["map_gigaspeech_spec_tokens"], True
    )
    assert text == "ok , next"

    with pytest.raises(KeyError):
        apply_text_transforms("x", ["no_such_transform"], True)


def test_quantize_length():
    cfg = BucketingConfig(pad_to_multiple=100)
    assert quantize_length(1, cfg) == 100
    assert quantize_length(100, cfg) == 100
    assert quantize_length(101, cfg) == 200
    cfg = BucketingConfig(buckets=(400, 800, 1600))
    assert quantize_length(5, cfg) == 400
    assert quantize_length(801, cfg) == 1600
    assert quantize_length(99999, cfg) == 1600


def test_bucketed_sampler_covers_all_and_groups_lengths():
    rng = np.random.default_rng(0)
    lengths = rng.integers(100, 2000, size=503)
    cfg = BucketingConfig(batch_size=16, num_length_groups=4, seed=1)
    sampler = BucketedBatchSampler(lengths, cfg)
    batches = list(sampler.epoch_batches(0))
    seen = [i for b in batches for i in b]
    assert sorted(seen) == list(range(503))
    # within-batch length spread should be far smaller than global spread
    spreads = [lengths[b].max() - lengths[b].min() for b in batches if len(b) == 16]
    assert np.median(spreads) < (lengths.max() - lengths.min()) / 3


def test_bucketed_sampler_host_sharding():
    lengths = list(range(100, 100 + 64))
    cfg = BucketingConfig(batch_size=8, num_length_groups=2)
    all_batches = list(BucketedBatchSampler(lengths, cfg).epoch_batches(0))
    shard0 = list(BucketedBatchSampler(lengths, cfg, num_hosts=2, host_id=0).epoch_batches(0))
    shard1 = list(BucketedBatchSampler(lengths, cfg, num_hosts=2, host_id=1).epoch_batches(0))
    assert len(shard0) + len(shard1) == len(all_batches)
    assert [b for pair in zip(shard0, shard1) for b in pair] == all_batches[: len(shard0) * 2]


def test_speech_collator_waveforms():
    cfg = CollatorConfig(bucketing=BucketingConfig(pad_to_multiple=1600))
    coll = SpeechCollator(cfg, tokenizer=DummyTokenizer())
    examples = [
        {"audio": np.ones(4000, np.float32) * 0.1, "text": "ab"},
        {"audio": {"array": np.ones(2500, np.float32) * 0.2}, "text": "hello"},
    ]
    batch = coll(examples)
    assert batch["input_values"].shape == (2, 4800)  # 4000 -> 4800 (×1600)
    assert list(batch["input_values_lengths"]) == [4000, 2500]
    assert batch["labels"].shape[1] % 8 == 0
    assert list(batch["label_lengths"]) == [2, 5]
    # padding is zeros
    assert batch["input_values"][0, 4000:].sum() == 0


def test_feature_collator():
    cfg = CollatorConfig(bucketing=BucketingConfig(pad_to_multiple=100))
    coll = FeatureCollator(cfg, tokenizer=DummyTokenizer())
    examples = [
        {"input_features": np.ones((250, 80), np.float32), "text": "xy"},
        {"input_features": np.ones((120, 80), np.float32), "text": "z"},
    ]
    batch = coll(examples)
    assert batch["input_features"].shape == (2, 300, 80)
    assert list(batch["input_lengths"]) == [250, 120]
    assert list(batch["label_lengths"]) == [2, 1]
