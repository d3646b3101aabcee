"""HF/torch → JAX conversion for the DeCRED joint model and GPT-2 decoders.

Maps the reference's ``JointCTCAttentionEncoderDecoder`` state dict
(reference: src/models/ctc_encoder_plus_autoregressive_decoder.py +
src/models/decoders/multi_head_gpt2.py) onto our Flax trees. GPT-2 uses
Conv1D layers that already store weights (in, out) — no transpose.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from huggingface_asr_tpu.interop.hf_ebranchformer import (
    convert_ebranchformer_ctc_state_dict,
)
from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv1d(sd, prefix):
    """HF GPT-2 Conv1D: weight (in, out) = flax Dense kernel directly."""
    out = {"kernel": sd[f"{prefix}.weight"]}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _linear(sd, prefix):
    """torch nn.Linear: weight (out, in) -> transpose."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_gpt2_decoder_state_dict(
    state_dict: Mapping[str, np.ndarray],
    config: GPT2DecoderConfig,
    prefix: str = "",
) -> Dict[str, Any]:
    """Convert a GPT2(MultiHead) decoder state dict to our param tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p = prefix

    params: Dict[str, Any] = {
        "wte": {"embedding": sd[f"{p}transformer.wte.weight"]},
        "ln_f": _ln(sd, f"{p}transformer.ln_f"),
    }
    if not config.pos_emb_fixed and f"{p}transformer.wpe.weight" in sd:
        params["wpe"] = sd[f"{p}transformer.wpe.weight"]

    for i in range(config.n_layer):
        b = f"{p}transformer.h.{i}"
        layer: Dict[str, Any] = {
            "ln_1": _ln(sd, f"{b}.ln_1"),
            "attn": {
                "c_attn": _conv1d(sd, f"{b}.attn.c_attn"),
                "c_proj": _conv1d(sd, f"{b}.attn.c_proj"),
            },
            "ln_2": _ln(sd, f"{b}.ln_2"),
            "mlp_c_fc": _conv1d(sd, f"{b}.mlp.c_fc"),
            "mlp_c_proj": _conv1d(sd, f"{b}.mlp.c_proj"),
        }
        if f"{b}.crossattention.c_attn.weight" in sd:
            layer["crossattention"] = {
                "q_attn": _conv1d(sd, f"{b}.crossattention.q_attn"),
                "c_attn": _conv1d(sd, f"{b}.crossattention.c_attn"),
                "c_proj": _conv1d(sd, f"{b}.crossattention.c_proj"),
            }
            layer["ln_cross_attn"] = _ln(sd, f"{b}.ln_cross_attn")
        params[f"h_{i}"] = layer

    if f"{p}lm_head.weight" in sd and not config.tie_word_embeddings:
        params["lm_head"] = {"kernel": np.ascontiguousarray(sd[f"{p}lm_head.weight"].T)}
    for k in range(len(config.head_locations)):
        key = f"{p}additional_lm_heads.{k}.weight"
        if key in sd and not config.tie_additional_weights:
            params[f"additional_lm_heads_{k}"] = {
                "kernel": np.ascontiguousarray(sd[key].T)
            }
    if f"{p}lm_mixing.weight" in sd:  # mixing "full" mode Linear
        params["lm_mixing"] = _linear(sd, f"{p}lm_mixing")
    elif f"{p}lm_mixing" in sd:  # "linear"/"scalar" Parameter
        params["lm_mixing"] = sd[f"{p}lm_mixing"]
    return params


def convert_joint_state_dict(
    state_dict: Mapping[str, np.ndarray],
    encoder_config: EBranchformerConfig,
    decoder_config: GPT2DecoderConfig,
) -> Dict[str, Any]:
    """Convert the full joint (DeCRED/ED) model state dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_sd = {
        k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")
    }
    params = {
        "encoder": convert_ebranchformer_ctc_state_dict(enc_sd, encoder_config),
        "decoder": convert_gpt2_decoder_state_dict(sd, decoder_config, "decoder."),
    }
    if "enc_to_dec_proj.weight" in sd:
        params["enc_to_dec_proj"] = _linear(sd, "enc_to_dec_proj")
    return params
