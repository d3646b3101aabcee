"""End-to-end AED CLI: train DeCRED tiny → final joint beam-search eval."""

import json
import os

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

WORDS = ["alpha", "beta", "gamma", "delta"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("aedcorpus")
    rng = np.random.default_rng(1)
    rows = {"audio": [], "text": [], "input_len": []}
    for i in range(16):
        n = int(rng.integers(4000, 6000))
        rows["audio"].append(rng.standard_normal(n).astype(np.float32) * 0.1)
        rows["text"].append(" ".join(rng.choice(WORDS, size=rng.integers(1, 4))))
        rows["input_len"].append(n / 16000.0)
    ds = datasets.Dataset.from_dict(rows)
    dd = datasets.DatasetDict({
        "train": ds, "validation": ds.select(range(4)), "test": ds.select(range(4)),
    })
    path = str(root / "ds")
    dd.save_to_disk(path)
    return path


@pytest.fixture(scope="module")
def tok_dir(corpus, tmp_path_factory):
    from huggingface_asr_tpu.cli.train_tokenizer import main

    out = str(tmp_path_factory.mktemp("aedtok"))
    main([
        "--dataset_name", corpus, "--load_from_disk", "--no-do_resample",
        "--tokenizer_type", "unigram", "--vocab_size", "40",
        "--tokenizer_output_dir", out,
    ])
    return out


def test_train_aed_e2e(corpus, tok_dir, tmp_path):
    from huggingface_asr_tpu.cli.train_aed import main

    model_cfg = {
        "encoder": {
            "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 2,
            "intermediate_size": 64, "conv_dim": [8, 8], "conv_kernel": [3, 3],
            "conv_stride": [2, 2], "conv_padding": [1, 1],
            "hidden_dropout": 0.0, "attention_dropout": 0.0,
        },
        "decoder": {
            "n_embd": 32, "n_layer": 1, "n_head": 2, "n_positions": 64,
            "head_locations": [], "head_weights": [1.0],
            "resid_pdrop": 0.0, "embd_pdrop": 0.0, "attn_pdrop": 0.0,
        },
    }
    cfg_path = tmp_path / "joint.json"
    cfg_path.write_text(json.dumps(model_cfg))
    out = str(tmp_path / "aed_out")

    results = main([
        "--dataset_name", corpus,
        "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tok_dir,
        "--model_config", str(cfg_path),
        "--dtype", "float32",
        "--output_dir", out,
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "4",
        "--max_steps", "3",
        "--logging_steps", "2",
        "--eval_steps", "2",
        "--save_steps", "3",
        "--warmup_steps", "1",
        "--ctc_weight", "0.3",
        "--num_beams", "2",
        "--max_length", "10",
        "--num_candidates", "8",
        "--override_for_evaluation", "ctc_weight=0.3;num_beams=2",
        "--max_duration_in_seconds", "2",
        "--pad_to_multiple", "25",
    ])
    assert os.path.exists(os.path.join(out, "final", "config.json"))
    assert "test" in results
    assert np.isfinite(results["test"].metrics["wer"])
    assert os.path.exists(os.path.join(out, "predictions_test.csv"))


def test_train_whisper_aed_e2e(corpus, tok_dir, tmp_path):
    """Whisper seq2seq fine-tune path through the real CLI
    (--model_family whisper): train → checkpoint → beam-search eval."""
    from huggingface_asr_tpu.cli.train_aed import main

    model_cfg = {
        "d_model": 32, "encoder_layers": 1, "encoder_attention_heads": 2,
        "encoder_ffn_dim": 64, "decoder_layers": 1,
        "decoder_attention_heads": 2, "decoder_ffn_dim": 64,
        "max_source_positions": 128, "max_target_positions": 32,
        "dropout": 0.0,
    }
    cfg_path = tmp_path / "whisper.json"
    cfg_path.write_text(json.dumps(model_cfg))
    out = str(tmp_path / "whisper_out")

    results = main([
        "--model_family", "whisper",
        "--dataset_name", corpus,
        "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tok_dir,
        "--model_config", str(cfg_path),
        "--dtype", "float32",
        "--output_dir", out,
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "4",
        "--max_steps", "3",
        "--logging_steps", "2",
        "--eval_steps", "2",
        "--save_steps", "3",
        "--warmup_steps", "1",
        "--num_beams", "2",
        "--max_length", "10",
        "--num_candidates", "8",
        "--max_duration_in_seconds", "2",
        "--pad_to_multiple", "25",
    ])
    assert os.path.exists(os.path.join(out, "final", "config.json"))
    assert "test" in results
    assert np.isfinite(results["test"].metrics["wer"])


def test_shallow_fusion_through_cli(corpus, tok_dir, tmp_path):
    """train_clm -> evaluate --lm_model/--lm_weight: the external LM is
    loaded and fused into the compiled beam search through the CLI surface
    (reference wiring: train_enc_dec_asr.py:61-77 + shallow_fussion.py).
    lm_weight=0 and lm_weight>0 must both decode; scores must differ."""
    import json as _json

    from huggingface_asr_tpu.cli.evaluate import main as eval_main
    from huggingface_asr_tpu.cli.train_aed import main as aed_main
    from huggingface_asr_tpu.cli.train_clm import main as clm_main

    # 1) tiny AED checkpoint
    model_cfg = {
        "encoder": {
            "hidden_size": 32, "num_hidden_layers": 1, "num_attention_heads": 2,
            "intermediate_size": 64, "conv_dim": [8, 8], "conv_kernel": [3, 3],
            "conv_stride": [2, 2], "conv_padding": [1, 1],
            "hidden_dropout": 0.0, "attention_dropout": 0.0,
        },
        "decoder": {
            "n_embd": 32, "n_layer": 1, "n_head": 2, "n_positions": 64,
            "head_locations": [], "head_weights": [1.0],
            "resid_pdrop": 0.0, "embd_pdrop": 0.0, "attn_pdrop": 0.0,
        },
    }
    cfg_path = tmp_path / "joint.json"
    cfg_path.write_text(_json.dumps(model_cfg))
    aed_out = str(tmp_path / "aed_lm_out")
    aed_main([
        "--dataset_name", corpus, "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tok_dir, "--model_config", str(cfg_path),
        "--dtype", "float32", "--output_dir", aed_out,
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "4",
        "--max_steps", "2", "--logging_steps", "2", "--eval_steps", "5",
        "--save_steps", "2", "--warmup_steps", "1", "--ctc_weight", "0.3",
        "--num_beams", "2", "--max_length", "10", "--num_candidates", "8",
        "--max_duration_in_seconds", "2", "--pad_to_multiple", "25",
    ])

    # 2) external LM through train_clm (same tokenizer/vocab)
    lm_out = str(tmp_path / "lm_out")
    clm_main([
        "--dataset_name", corpus, "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tok_dir, "--output_dir", lm_out,
        "--block_size", "16", "--n_embd", "32", "--n_layer", "1",
        "--n_head", "2", "--per_device_train_batch_size", "8",
        "--max_steps", "2", "--logging_steps", "2", "--save_steps", "2",
        "--warmup_steps", "1", "--dtype", "float32",
    ])
    lm_final = os.path.join(lm_out, "final")
    assert os.path.exists(os.path.join(lm_final, "config.json"))

    # 3) evaluate with and without fusion
    def run_eval(lm_weight, out):
        return eval_main([
            "--model_type", "aed",
            "--dataset_name", corpus, "--load_from_disk", "--no-do_resample",
            "--tokenizer_name", tok_dir,
            "--from_pretrained", os.path.join(aed_out, "final"),
            "--dtype", "float32", "--output_dir", out,
            "--batch_size", "4", "--num_beams", "2", "--max_length", "10",
            "--num_candidates", "8", "--ctc_weight", "0.3",
            "--lm_model", lm_final, "--lm_weight", str(lm_weight),
            "--max_duration_in_seconds", "2",
        ])
    r0 = run_eval(0.0, str(tmp_path / "ev0"))
    r1 = run_eval(0.5, str(tmp_path / "ev1"))
    assert "test" in r0 and "test" in r1
    assert np.isfinite(r0["test"].metrics["wer"])
    assert np.isfinite(r1["test"].metrics["wer"])
