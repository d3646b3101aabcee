"""HF Whisper encoder → JAX conversion (for the Whisper-CTC fine-tune path).

Maps HF ``WhisperEncoder`` weights (as used by the reference's recipe-local
WhisperEncoderForCTC, recipes_v0.0.1/librispeech_whisper_ctc/whisper_ctc.py)
onto our Flax tree. Extension parts (dim_matching, additional layer,
subsample convs, lm_head) convert when present in a trained reference
checkpoint; loading a plain pretrained Whisper initializes only the encoder.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from huggingface_asr_tpu.models.whisper_ctc import WhisperCTCConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv1d(w):
    """torch Conv1d (O, I, k) -> flax (k, I, O)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _ln(sd, p):
    return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}


def _dense(sd, p, bias=True):
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if bias and f"{p}.bias" in sd:
        out["bias"] = sd[f"{p}.bias"]
    return out


def _attn(sd, p):
    return {
        "q_proj": _dense(sd, f"{p}.q_proj"),
        "k_proj": _dense(sd, f"{p}.k_proj", bias=False),
        "v_proj": _dense(sd, f"{p}.v_proj"),
        "out_proj": _dense(sd, f"{p}.out_proj"),
    }


def _layer(sd, p):
    return {
        "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
        "self_attn": _attn(sd, f"{p}.self_attn"),
        "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        "fc1": _dense(sd, f"{p}.fc1"),
        "fc2": _dense(sd, f"{p}.fc2"),
    }


def convert_whisper_encoder_state_dict(
    state_dict: Mapping[str, np.ndarray],
    config: WhisperCTCConfig,
    prefix: str = "",
) -> Dict[str, Any]:
    """Convert an HF WhisperEncoder (or reference WhisperEncoderForCTC) dict."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p = prefix
    enc = p if f"{p}conv1.weight" in sd else f"{p}encoder."

    params: Dict[str, Any] = {
        "conv1": {"kernel": _conv1d(sd[f"{enc}conv1.weight"]),
                  "bias": sd[f"{enc}conv1.bias"]},
        "conv2": {"kernel": _conv1d(sd[f"{enc}conv2.weight"]),
                  "bias": sd[f"{enc}conv2.bias"]},
        "layer_norm": _ln(sd, f"{enc}layer_norm"),
    }
    for i in range(config.encoder_layers):
        params[f"layers_{i}"] = _layer(sd, f"{enc}layers.{i}")

    # extension weights (present in trained reference CTC checkpoints)
    if f"{p}dim_matching.weight" in sd:
        params["dim_matching"] = _dense(sd, f"{p}dim_matching")
    if f"{p}additional_layer_1.self_attn.q_proj.weight" in sd:
        params["additional_layer_1"] = _layer(sd, f"{p}additional_layer_1")
    for i in (1, 2):
        key = f"{p}subsample_conv{i}.weight"
        if key in sd:
            params[f"subsample_conv{i}"] = {"kernel": _conv1d(sd[key])}
    if f"{p}lm_head.weight" in sd:
        params["lm_head"] = {"kernel": _t(sd[f"{p}lm_head.weight"])}
    return params


def convert_whisper_seq2seq_state_dict(
    state_dict: Mapping[str, np.ndarray], config
) -> Dict[str, Any]:
    """HF WhisperForConditionalGeneration → our WhisperForConditionalGeneration.

    config: WhisperSeq2SeqConfig. The lm head is tied to embed_tokens in both
    implementations, so only the embedding converts.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    pre = "model." if "model.encoder.conv1.weight" in sd else ""

    enc: Dict[str, Any] = {
        "conv1": {"kernel": _conv1d(sd[f"{pre}encoder.conv1.weight"]),
                  "bias": sd[f"{pre}encoder.conv1.bias"]},
        "conv2": {"kernel": _conv1d(sd[f"{pre}encoder.conv2.weight"]),
                  "bias": sd[f"{pre}encoder.conv2.bias"]},
        "layer_norm": _ln(sd, f"{pre}encoder.layer_norm"),
    }
    for i in range(config.encoder_layers):
        enc[f"layers_{i}"] = _layer(sd, f"{pre}encoder.layers.{i}")

    dec: Dict[str, Any] = {
        "embed_tokens": {"embedding": sd[f"{pre}decoder.embed_tokens.weight"]},
        "embed_positions": sd[f"{pre}decoder.embed_positions.weight"],
        "layer_norm": _ln(sd, f"{pre}decoder.layer_norm"),
    }
    for i in range(config.decoder_layers):
        p = f"{pre}decoder.layers.{i}"
        dec[f"layers_{i}"] = {
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "encoder_attn_layer_norm": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "encoder_attn": _attn(sd, f"{p}.encoder_attn"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
            "fc1": _dense(sd, f"{p}.fc1"),
            "fc2": _dense(sd, f"{p}.fc2"),
        }
    return {"encoder": enc, "decoder": dec}
