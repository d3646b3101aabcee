"""Batch assembly: padded fixed-shape numpy batches for the compiled step.

TPU-native rethink of the reference collators (reference:
src/utilities/collators.py:21-106): instead of CPU-side featurization +
augmentation in DataLoader workers, the collator pads RAW WAVEFORMS (or
precomputed mel features) to a quantized length and tokenizes labels; the
log-mel front end and SpecAugment run inside the compiled train step on TPU.
Label padding uses explicit ``label_lengths`` (our CTC/attention losses take
lengths, not -100 sentinels).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from huggingface_asr_tpu.data.bucketing import BucketingConfig, quantize_length


@dataclasses.dataclass(frozen=True)
class CollatorConfig:
    audio_key: str = "audio"
    text_key: str = "text"
    sampling_rate: int = 16000
    bucketing: BucketingConfig = BucketingConfig()
    label_pad_to_multiple: int = 8
    max_label_length: Optional[int] = None
    # Mask tokens matching the UNK token with pad (reference collators.py:97-98).
    mask_unks: bool = False
    unk_token_id: Optional[int] = None


class SpeechCollator:
    """Assemble examples into fixed-shape batches.

    Examples are dicts with ``audio`` (1-D float np.ndarray or HF-style
    {"array": ...}) and optionally ``text`` (str) or ``labels`` (list[int]).
    ``tokenizer`` is any object with an ``encode(str) -> List[int]`` method
    (HF tokenizers work as-is).
    """

    def __init__(self, config: CollatorConfig = CollatorConfig(), tokenizer=None,
                 audio_transform=None):
        self.config = config
        self.tokenizer = tokenizer
        # host-side waveform transform (e.g. SpeedPerturbation), train only
        self.audio_transform = audio_transform

    def _audio_array(self, audio) -> np.ndarray:
        if isinstance(audio, dict):
            audio = audio.get("array", audio)
        arr = np.asarray(audio, dtype=np.float32)
        arr = np.trim_zeros(arr)
        if self.audio_transform is not None:
            arr = self.audio_transform(arr)
        return arr

    def _encode(self, text: str) -> List[int]:
        ids = self.tokenizer.encode(text)
        if hasattr(ids, "ids"):  # raw `tokenizers` Encoding
            ids = ids.ids
        if self.config.max_label_length:
            ids = ids[: self.config.max_label_length]
        return list(ids)

    def __call__(self, examples: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        from huggingface_asr_tpu.data.native_collate import collate_f32

        # step-delayed transform chains count assembled batches
        if hasattr(self.audio_transform, "advance_batch"):
            self.audio_transform.advance_batch()

        cfg = self.config
        audios = [self._audio_array(e[cfg.audio_key]) for e in examples]
        padded_len = quantize_length(max(len(a) for a in audios), cfg.bucketing)
        waveforms, lengths = collate_f32(audios, padded_len)

        batch = {"input_values": waveforms, "input_values_lengths": lengths}

        label_lists = None
        if all("labels" in e for e in examples):
            label_lists = [list(e["labels"]) for e in examples]
        elif self.tokenizer is not None and all(cfg.text_key in e for e in examples):
            label_lists = [self._encode(e[cfg.text_key]) for e in examples]

        if label_lists is not None:
            from huggingface_asr_tpu.data.native_collate import collate_i32

            if cfg.mask_unks and cfg.unk_token_id is not None:
                label_lists = [
                    [t for t in ids if t != cfg.unk_token_id] for ids in label_lists
                ]
            m = cfg.label_pad_to_multiple
            L = max(max((len(l) for l in label_lists), default=1), 1)
            L = ((L + m - 1) // m) * m
            labels, label_lengths = collate_i32(label_lists, L, fill=0)
            batch["labels"] = labels
            batch["label_lengths"] = label_lengths
        return batch


class FeatureCollator(SpeechCollator):
    """Variant over precomputed mel features (B, T, F) instead of waveforms."""

    def __call__(self, examples: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        cfg = self.config
        feats = [np.asarray(e["input_features"], dtype=np.float32) for e in examples]
        lengths = np.asarray([f.shape[0] for f in feats], dtype=np.int32)
        padded_len = quantize_length(int(lengths.max()), cfg.bucketing)
        B, F = len(feats), feats[0].shape[1]
        out = np.zeros((B, padded_len, F), dtype=np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = f
        batch = {"input_features": out, "input_lengths": lengths}

        text_batch = super().__call__(
            [{**e, cfg.audio_key: np.zeros(1, np.float32)} for e in examples]
        )
        for key in ("labels", "label_lengths"):
            if key in text_batch:
                batch[key] = text_batch[key]
        return batch
