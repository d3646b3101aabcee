"""Loader for reference-style on-the-fly preprocessing JSON configs.

The reference drives per-split transform chains from JSON files
(reference: configs/default_data_preprocessing2d.json, interpreted by
DataPreprocessingManagerCallback, callbacks.py:69-140): entries name a
transform (dotted import path or "feature_extractor"), constructor params,
and a ``steps_before_activation`` delay. This loader maps that SAME schema
onto our TPU-first placement:

  * torchaudio.transforms.SpeedPerturbation  -> host-side SpeedPerturbation
  * feature_extractor                        -> in-step log-mel (no host op)
  * augmentations.spec_aug.SpecAug           -> in-step SpecAugmentConfig
                                                (+ start-step scheduling)

so existing reference preprocessing JSONs work unchanged.
"""

from __future__ import annotations

import dataclasses
import json
from typing import List, Optional

from huggingface_asr_tpu.data.augment import SpeedPerturbation, SpeedPerturbationConfig
from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig


@dataclasses.dataclass
class PreprocessingPlan:
    # host-side waveform transforms (train split)
    speed_perturbation: Optional[SpeedPerturbation] = None
    # on-device augmentation + activation step
    spec_augment: Optional[SpecAugmentConfig] = None
    spec_augment_start_step: int = 0
    featurize_on_device: bool = True


def load_preprocessing_config(path: str, seed: int = 0) -> PreprocessingPlan:
    with open(path) as f:
        cfg = json.load(f)
    plan = PreprocessingPlan()
    for entry in cfg.get("train", []):
        name = entry.get("name", "")
        params = entry.get("params", {})
        if "SpeedPerturbation" in name:
            plan.speed_perturbation = SpeedPerturbation(
                SpeedPerturbationConfig(
                    factors=tuple(params.get("factors", (0.9, 1.0, 1.1))),
                    orig_freq=params.get("orig_freq", 16000),
                ),
                seed=seed,
            )
        elif name == "feature_extractor":
            plan.featurize_on_device = True
        elif "SpecAug" in name:
            kwargs = {}
            mapping = {
                "apply_time_warp": "apply_time_warp",
                "time_warp_window": "time_warp_window",
                "apply_freq_mask": "apply_freq_mask",
                "freq_mask_width_range": "freq_mask_width_range",
                "num_freq_mask": "num_freq_mask",
                "apply_time_mask": "apply_time_mask",
                "time_mask_width_range": "time_mask_width_range",
                "time_mask_width_ratio_range": "time_mask_width_ratio_range",
                "num_time_mask": "num_time_mask",
            }
            for src, dst in mapping.items():
                if src in params:
                    v = params[src]
                    kwargs[dst] = tuple(v) if isinstance(v, list) else v
            if "time_mask_width_range" in kwargs:
                kwargs.setdefault("time_mask_width_ratio_range", None)
            plan.spec_augment = SpecAugmentConfig(**kwargs)
            plan.spec_augment_start_step = entry.get("steps_before_activation", 0)
        # unknown entries: ignore (e.g. eval-only FE entries under other keys)
    return plan
