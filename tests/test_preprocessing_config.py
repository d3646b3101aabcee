"""Reference-schema preprocessing JSON loading + speed perturbation."""

import json

import numpy as np

from huggingface_asr_tpu.data.augment import SpeedPerturbation, SpeedPerturbationConfig
from huggingface_asr_tpu.data.preprocessing_config import load_preprocessing_config


def test_speed_perturbation_changes_length():
    sp = SpeedPerturbation(SpeedPerturbationConfig(factors=(0.9,)), seed=0)
    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    y = sp(x)
    # speed 0.9 -> longer signal (resampled by 1/0.9)
    assert abs(len(y) - 16000 / 0.9) < 100


def test_speed_perturbation_identity():
    sp = SpeedPerturbation(SpeedPerturbationConfig(factors=(1.0,)), seed=0)
    x = np.ones(1000, np.float32)
    np.testing.assert_array_equal(sp(x), x)


def test_load_reference_schema(tmp_path):
    # exact schema of configs/default_data_preprocessing2d.json
    cfg = {
        "train": [
            {"name": "torchaudio.transforms.SpeedPerturbation",
             "params": {"orig_freq": 16000, "factors": [0.9, 1.0, 1.1]},
             "steps_before_activation": 0, "return_behaviour": [0],
             "fn_call_params": {}},
            {"name": "feature_extractor", "steps_before_activation": 0,
             "fn_call_params": {"return_attention_mask": False, "padding": False,
                                "sampling_rate": 16000, "return_tensors": "pt"},
             "return_behaviour": ["input_features[0]"]},
            {"name": "augmentations.spec_aug.SpecAug",
             "params": {"apply_time_warp": True, "time_warp_window": 5,
                        "time_warp_mode": "bicubic", "apply_freq_mask": True,
                        "freq_mask_width_range": [0, 27], "num_freq_mask": 2,
                        "apply_time_mask": True,
                        "time_mask_width_ratio_range": [0, 0.05],
                        "num_time_mask": 5},
             "steps_before_activation": 100, "fn_call_params": {},
             "return_behaviour": [0]},
        ],
        "default_preprocessing": [
            {"name": "feature_extractor", "steps_before_activation": 0,
             "fn_call_params": {}, "return_behaviour": ["input_features[0]"]},
        ],
    }
    path = tmp_path / "prep.json"
    path.write_text(json.dumps(cfg))
    plan = load_preprocessing_config(str(path))
    assert plan.speed_perturbation is not None
    assert plan.spec_augment is not None
    assert plan.spec_augment.freq_mask_width_range == (0, 27)
    assert plan.spec_augment.num_time_mask == 5
    assert plan.spec_augment.time_mask_width_ratio_range == (0, 0.05)
    assert plan.spec_augment_start_step == 100
    assert plan.featurize_on_device


def test_load_actual_reference_config():
    plan = load_preprocessing_config(
        "/root/reference/configs/default_data_preprocessing2d.json"
    )
    assert plan.speed_perturbation is not None
    assert plan.spec_augment is not None and plan.spec_augment.num_freq_mask == 2


class _TimesN:
    """Importable custom transform used by the dotted-path test."""

    def __init__(self, n=2.0):
        self.n = n

    def __call__(self, audio, offset=0.0):
        return (audio * self.n + offset, "extra")


def test_custom_dotted_transform_runs_in_chain(tmp_path):
    """Arbitrary dotted import paths resolve and run host-side in order,
    with fn_call_params, return_behaviour extraction and delayed start
    (reference callbacks.py:86-89 + general_utils.py:34-60)."""
    cfg = {
        "train": [
            {"name": f"{__name__}._TimesN", "params": {"n": 3.0},
             "steps_before_activation": 0,
             "fn_call_params": {"offset": 1.0}, "return_behaviour": [0]},
            {"name": f"{__name__}._TimesN", "params": {"n": 10.0},
             "steps_before_activation": 5,
             "fn_call_params": {}, "return_behaviour": [0]},
        ]
    }
    path = tmp_path / "prep.json"
    path.write_text(json.dumps(cfg))
    plan = load_preprocessing_config(str(path))
    chain = plan.audio_transform
    assert chain is not None and len(chain) == 2

    x = np.ones(4, np.float32)
    # step 0: only the first stage is active
    np.testing.assert_allclose(chain(x), x * 3.0 + 1.0)
    # past the delay, the second stage joins the chain
    chain.set_step(5)
    np.testing.assert_allclose(chain(x), (x * 3.0 + 1.0) * 10.0)
    # advance_batch counts toward the same schedule
    chain.set_step(4)
    np.testing.assert_allclose(chain(x), x * 3.0 + 1.0)
    chain.advance_batch()
    np.testing.assert_allclose(chain(x), (x * 3.0 + 1.0) * 10.0)


def test_unknown_transform_raises(tmp_path):
    """A typo'd name must fail loudly, not silently vanish."""
    import pytest

    bad = {"train": [{"name": "SpekAug", "params": {}}]}
    path = tmp_path / "bad.json"
    path.write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="unknown preprocessing transform"):
        load_preprocessing_config(str(path))

    missing = {"train": [{"name": "nonexistent_pkg.Thing", "params": {}}]}
    path2 = tmp_path / "bad2.json"
    path2.write_text(json.dumps(missing))
    with pytest.raises(ValueError, match="not importable"):
        load_preprocessing_config(str(path2))
