"""Publish flow: checkpoint → complete hub repo dir the reference torch
classes can load (reference publish flow: train_enc_dec_asr.py:154-162)."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from huggingface_asr_tpu.cli.publish_model import main as publish_main
from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
from huggingface_asr_tpu.training.model_factory import save_params


def _tiny_ckpt(tmp_path):
    cfg = EBranchformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=(32, 32), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=50,
    )
    model = EBranchformerForCTC(cfg, dtype=jnp.float32)
    feats = jnp.zeros((1, 40, 80), jnp.float32)
    params = model.init(jax.random.key(0), feats, jnp.asarray([40], jnp.int32))[
        "params"
    ]
    ckpt = os.path.join(tmp_path, "final")
    save_params(params, ckpt, config=cfg)
    return cfg, params, ckpt


def test_publish_builds_loadable_repo(tmp_path):
    from models.encoders.e_branchformer import (
        Wav2Vec2EBranchformerConfig,
        Wav2Vec2EBranchformerForCTC,
    )

    cfg, params, ckpt = _tiny_ckpt(str(tmp_path))
    out = os.path.join(str(tmp_path), "hub_repo")
    publish_main([
        "--checkpoint", ckpt, "--output_dir", out, "--model_type", "ctc",
        "--repo_id", "user/tiny-ebf", "--run_url", "https://wandb.ai/run/abc",
    ])

    # repo layout
    for name in ("pytorch_model.bin", "config.json", "preprocessor_config.json",
                 "README.md"):
        assert os.path.exists(os.path.join(out, name)), name

    with open(os.path.join(out, "config.json")) as f:
        cfg_json = json.load(f)
    assert cfg_json["hidden_size"] == 64
    assert cfg_json["architectures"] == ["Wav2Vec2EBranchformerForCTC"]

    card = open(os.path.join(out, "README.md")).read()
    assert "### Wandb run" in card and "https://wandb.ai/run/abc" in card
    assert card.startswith("---\n")          # YAML metadata block

    with open(os.path.join(out, "preprocessor_config.json")) as f:
        pp = json.load(f)
    assert pp["feature_size"] == 80 and pp["sampling_rate"] == 16000

    # the exported weights load into the reference class with no missing keys
    hf_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32, 32], conv_kernel=[3, 3],
        conv_stride=[2, 2], conv_padding=(1, 1), num_fbanks=80,
        num_mel_bins=80, vocab_size=50, use_fbanks=True,
        second_dim_input_size=80, apply_spec_augment=False,
        num_feat_extract_layers=2, attn_implementation="eager",
    )
    ref = Wav2Vec2EBranchformerForCTC(hf_cfg)
    sd = torch.load(
        os.path.join(out, "pytorch_model.bin"), weights_only=False
    )
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    real_missing = [m for m in missing if "masked_spec_embed" not in m]
    assert not real_missing, real_missing
    assert not unexpected, unexpected


def test_push_requires_network(tmp_path):
    """push_to_hub surfaces a clean failure offline instead of silently
    skipping (zero-egress environment)."""
    from huggingface_asr_tpu.interop.publish import push_to_hub

    with pytest.raises(Exception):
        push_to_hub(str(tmp_path), "user/nonexistent-model-xyz")
