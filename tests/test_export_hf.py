"""Roundtrip: HF state dict → our params → exported HF state dict equality."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from huggingface_asr_tpu.interop.export_hf import (
    export_ebranchformer_ctc,
    export_gpt2_decoder,
)
from huggingface_asr_tpu.interop.hf_decred import convert_gpt2_decoder_state_dict
from huggingface_asr_tpu.interop.hf_ebranchformer import (
    convert_ebranchformer_ctc_state_dict,
)
from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig


def test_encoder_roundtrip():
    from models.encoders.e_branchformer import (
        Wav2Vec2EBranchformerConfig,
        Wav2Vec2EBranchformerForCTC,
    )

    hf_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[32, 32], conv_kernel=[3, 3],
        conv_stride=[2, 2], conv_padding=(1, 1), num_fbanks=80, num_mel_bins=80,
        vocab_size=50, use_fbanks=True, second_dim_input_size=80,
        apply_spec_augment=False, num_feat_extract_layers=2,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = Wav2Vec2EBranchformerForCTC(hf_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    cfg = EBranchformerConfig.from_hf_config(hf_cfg)
    params = convert_ebranchformer_ctc_state_dict(sd, cfg)
    back = export_ebranchformer_ctc(params, cfg)

    missing = set(sd) - set(back) - {"wav2vec2.masked_spec_embed"}
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k in back:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_decoder_roundtrip():
    from models.decoders.multi_head_gpt2 import GPT2MultiHeadConfig, GPT2LMMultiHeadModel

    hf_cfg = GPT2MultiHeadConfig(
        vocab_size=50, n_positions=64, n_embd=32, n_layer=2, n_head=2,
        add_cross_attention=True, head_locations=[1], head_weights=[0.5, 0.5],
        lsm_factor=0.0, tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    ref = GPT2LMMultiHeadModel(hf_cfg)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    cfg = GPT2DecoderConfig(
        vocab_size=50, n_positions=64, n_embd=32, n_layer=2, n_head=2,
        add_cross_attention=True, head_locations=(1,), head_weights=(0.5, 0.5),
    )
    params = convert_gpt2_decoder_state_dict(sd, cfg)
    back = export_gpt2_decoder(params, cfg)
    # attn.bias buffers (causal masks) are non-parameters; ignore them
    param_keys = {k for k in sd if not k.endswith(".attn.bias")
                  and not k.endswith(".attn.masked_bias")}
    missing = param_keys - set(back)
    assert not missing, f"missing keys: {sorted(missing)[:5]}"
    for k in back:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
