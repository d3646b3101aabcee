"""HF/torch → JAX checkpoint conversion for the E-Branchformer CTC family.

Offline interop tool (host-side, numpy only in the hot path): maps the
reference's ``Wav2Vec2EBranchformerForCTC`` state dict (reference:
src/models/encoders/e_branchformer.py:408-496) onto our Flax parameter tree.
Checkpoint conversion preserves logits exactly (same math, fp32), which the
golden parity tests verify.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from huggingface_asr_tpu.models.configs import EBranchformerConfig


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv2d(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv1d(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (O, I/g, k) -> flax (k, I/g, O)."""
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ff(sd, prefix):
    return {
        "intermediate_dense": _dense(sd, f"{prefix}.intermediate_dense"),
        "output_dense": _dense(sd, f"{prefix}.output_dense"),
    }


def convert_ebranchformer_ctc_state_dict(
    state_dict: Mapping[str, np.ndarray], config: EBranchformerConfig
) -> Dict[str, Any]:
    """Convert a torch state dict (numpy values) to our Flax param tree."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    fe: Dict[str, Any] = {}
    for i in range(len(config.conv_dim)):
        base = f"wav2vec2.feature_extractor.conv.{i}.0"
        # ContextAwareConv2d wraps either a plain Conv2d or a gated variant.
        if f"{base}.conv.conv.weight" in sd:  # gated: ContextAware -> GatedConv2d
            fe[f"conv_{i}"] = {
                "kernel": _conv2d(sd[f"{base}.conv.conv.weight"]),
                "bias": sd[f"{base}.conv.conv.bias"],
            }
            fe[f"gate_{i}"] = {
                "kernel": _conv2d(sd[f"{base}.conv.gate.weight"]),
                "bias": sd[f"{base}.conv.gate.bias"],
            }
        else:
            fe[f"conv_{i}"] = {
                "kernel": _conv2d(sd[f"{base}.conv.weight"]),
                "bias": sd[f"{base}.conv.bias"],
            }
    fe["out"] = _dense(sd, "wav2vec2.feature_extractor.out")

    encoder: Dict[str, Any] = {"layer_norm": _ln(sd, "wav2vec2.encoder.layer_norm")}
    for i in range(config.num_hidden_layers):
        p = f"wav2vec2.encoder.layers.{i}"
        attn = {
            "linear_q": _dense(sd, f"{p}.self_attn.linear_q"),
            "linear_k": _dense(sd, f"{p}.self_attn.linear_k"),
            "linear_v": _dense(sd, f"{p}.self_attn.linear_v"),
            "linear_out": _dense(sd, f"{p}.self_attn.linear_out"),
        }
        if f"{p}.self_attn.linear_pos.weight" in sd:
            attn["linear_pos"] = _dense(sd, f"{p}.self_attn.linear_pos")
            attn["pos_bias_u"] = sd[f"{p}.self_attn.pos_bias_u"]
            attn["pos_bias_v"] = sd[f"{p}.self_attn.pos_bias_v"]

        csgu = {
            "norm": _ln(sd, f"{p}.cgMLP.csgu.norm"),
            "conv": {
                "kernel": _conv1d(sd[f"{p}.cgMLP.csgu.conv.weight"]),
                "bias": sd[f"{p}.cgMLP.csgu.conv.bias"],
            },
        }
        if f"{p}.cgMLP.csgu.linear.weight" in sd:
            csgu["linear"] = _dense(sd, f"{p}.cgMLP.csgu.linear")

        layer = {
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": attn,
            "cgMLP_layer_norm": _ln(sd, f"{p}.cgMLP_layer_norm"),
            "cgMLP": {
                "channel_proj1": _dense(sd, f"{p}.cgMLP.channel_proj1.0"),
                "csgu": csgu,
                "channel_proj2": _dense(sd, f"{p}.cgMLP.channel_proj2"),
            },
            "depthwise_conv_fusion": {
                "kernel": _conv1d(sd[f"{p}.depthwise_conv_fusion.weight"]),
                "bias": sd[f"{p}.depthwise_conv_fusion.bias"],
            },
            "merge_proj": _dense(sd, f"{p}.merge_proj"),
            "final_layer_norm": _ln(sd, f"{p}.final_layer_norm"),
        }
        if config.use_macaron_ff:
            layer["ff1_layer_norm"] = _ln(sd, f"{p}.ff1.0")
            layer["ff1"] = _ff(sd, f"{p}.ff1.1")
            layer["ff2_layer_norm"] = _ln(sd, f"{p}.ff2.0")
            layer["ff2"] = _ff(sd, f"{p}.ff2.1")
        encoder[f"layers_{i}"] = layer

    params: Dict[str, Any] = {
        "wav2vec2": {
            "feature_extractor": fe,
            "feature_projection": {
                "layer_norm": _ln(sd, "wav2vec2.feature_projection.layer_norm"),
                "projection": _dense(sd, "wav2vec2.feature_projection.projection"),
            },
            "encoder": encoder,
        }
    }
    if "lm_head.weight" in sd:
        params["lm_head"] = _dense(sd, "lm_head")
    if "blank_projection.weight" in sd:
        params["blank_projection"] = _dense(sd, "blank_projection")
    return params


def load_hf_ctc_checkpoint(path: str, config: EBranchformerConfig) -> Dict[str, Any]:
    """Load a reference checkpoint directory/file and convert it.

    Accepts a ``pytorch_model.bin`` / ``model.safetensors`` file or a directory
    containing one. torch is imported lazily (host-side tool only).
    """
    import os

    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {
            k: v.detach().cpu().numpy()
            for k, v in torch.load(path, map_location="cpu", weights_only=True).items()
        }
    return convert_ebranchformer_ctc_state_dict(sd, config)
