"""CLI e2e coverage for the recipe-local model families: Whisper-encoder CTC
and LLM-ASR trained/evaluated through the real entry points (reference drives
these through its CTC trainer with recipe-local imports,
recipes_v0.0.1/librispeech_whisper_ctc/whisper_ctc.py:120-251 and
local_models.py:10-243 + train scripts in that dir).
"""

import json
import os

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

WORDS = ["hello", "world", "speech", "model", "test", "data"]


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_recipe")
    rng = np.random.default_rng(3)
    rows = {"audio": [], "text": [], "input_len": []}
    for _ in range(16):
        n = int(rng.integers(4000, 8000))
        rows["audio"].append(rng.standard_normal(n).astype(np.float32) * 0.1)
        rows["text"].append(" ".join(rng.choice(WORDS, size=rng.integers(2, 4))))
        rows["input_len"].append(n / 16000.0)
    ds = datasets.Dataset.from_dict(rows)
    dd = datasets.DatasetDict({
        "train": ds,
        "validation": ds.select(range(4)),
        "test": ds.select(range(4)),
    })
    path = str(root / "ds")
    dd.save_to_disk(path)
    return path


@pytest.fixture(scope="module")
def tokenizer_dir(tiny_corpus, tmp_path_factory):
    from huggingface_asr_tpu.cli.train_tokenizer import main

    out = str(tmp_path_factory.mktemp("tok_recipe"))
    main([
        "--dataset_name", tiny_corpus, "--load_from_disk", "--no-do_resample",
        "--tokenizer_type", "unigram", "--vocab_size", "48",
        "--tokenizer_output_dir", out,
    ])
    return out


COMMON_TRAIN_ARGS = [
    "--load_from_disk", "--no-do_resample", "--dtype", "float32",
    "--per_device_train_batch_size", "8", "--per_device_eval_batch_size", "4",
    "--max_steps", "3", "--logging_steps", "2", "--eval_steps", "100",
    "--save_steps", "3", "--warmup_steps", "1",
    "--max_duration_in_seconds", "2", "--pad_to_multiple", "25",
    "--no-apply_spec_augment",
]


def test_whisper_ctc_train_and_evaluate_cli(tiny_corpus, tokenizer_dir, tmp_path):
    from huggingface_asr_tpu.cli.train_ctc import main as train_main

    cfg = {
        "d_model": 32, "encoder_layers": 1, "encoder_attention_heads": 2,
        "encoder_ffn_dim": 64, "max_source_positions": 256,
        "llm_dim": 32, "additional_head_count": 2, "blank_token_id": 0,
    }
    cfg_path = tmp_path / "whisper_ctc.json"
    cfg_path.write_text(json.dumps(cfg))
    out = str(tmp_path / "out")
    results = train_main([
        "--dataset_name", tiny_corpus, "--tokenizer_name", tokenizer_dir,
        "--model_family", "whisper_ctc", "--model_config", str(cfg_path),
        "--output_dir", out, *COMMON_TRAIN_ARGS,
    ])
    final = os.path.join(out, "final")
    assert os.path.exists(os.path.join(final, "config.json"))
    assert "test" in results and np.isfinite(results["test"].metrics["wer"])
    saved = json.load(open(os.path.join(final, "config.json")))
    assert saved["d_model"] == 32 and saved["blank_token_id"] == 0

    from huggingface_asr_tpu.cli.evaluate import main as eval_main

    eval_out = str(tmp_path / "eval_out")
    results = eval_main([
        "--dataset_name", tiny_corpus, "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tokenizer_dir, "--from_pretrained", final,
        "--model_type", "whisper_ctc", "--dtype", "float32",
        "--output_dir", eval_out, "--batch_size", "4",
    ])
    assert "test" in results and np.isfinite(results["test"].metrics["wer"])
    assert os.path.exists(os.path.join(eval_out, "predictions_test.csv"))


def test_llm_asr_train_and_evaluate_cli(tiny_corpus, tokenizer_dir, tmp_path):
    from huggingface_asr_tpu.cli.train_ctc import main as train_main

    cfg = {
        "encoder": {
            "d_model": 32, "encoder_layers": 1, "encoder_attention_heads": 2,
            "encoder_ffn_dim": 64, "max_source_positions": 256,
            "llm_dim": 32, "additional_head_count": 2, "blank_token_id": 0,
        },
        "decoder": {
            "n_embd": 32, "n_layer": 1, "n_head": 2, "n_positions": 512,
            "add_cross_attention": False,
        },
        "number_of_prompt_tokens": 4,
        "ctc_weight": 0.3,
    }
    cfg_path = tmp_path / "llm_asr.json"
    cfg_path.write_text(json.dumps(cfg))
    out = str(tmp_path / "out")
    results = train_main([
        "--dataset_name", tiny_corpus, "--tokenizer_name", tokenizer_dir,
        "--model_family", "llm_asr", "--model_config", str(cfg_path),
        "--output_dir", out, *COMMON_TRAIN_ARGS,
    ])
    final = os.path.join(out, "final")
    assert os.path.exists(os.path.join(final, "config.json"))
    assert "test" in results and np.isfinite(results["test"].metrics["wer"])
    saved = json.load(open(os.path.join(final, "config.json")))
    assert saved["number_of_prompt_tokens"] == 4
    assert saved["encoder"]["d_model"] == 32

    from huggingface_asr_tpu.cli.evaluate import main as eval_main

    eval_out = str(tmp_path / "eval_out")
    results = eval_main([
        "--dataset_name", tiny_corpus, "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tokenizer_dir, "--from_pretrained", final,
        "--model_type", "llm_asr", "--dtype", "float32",
        "--output_dir", eval_out, "--batch_size", "4", "--max_length", "12",
    ])
    assert "test" in results and np.isfinite(results["test"].metrics["wer"])
    assert os.path.exists(os.path.join(eval_out, "predictions_test.csv"))
