"""JAX → HF/torch state-dict export (inverse of the import converters).

Enables publishing our checkpoints in the reference's format (the
hf_shared_models push scripts' role, reference: hf_shared_models/*.py) and
two-way parity checking. Exports numpy state dicts keyed exactly like the
reference models; ``save_torch_checkpoint`` writes a loadable
``pytorch_model.bin``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv2d_inv(w) -> np.ndarray:
    """flax (kh, kw, I, O) -> torch (O, I, kh, kw)."""
    return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))


def _conv1d_inv(w) -> np.ndarray:
    """flax (k, I/g, O) -> torch (O, I/g, k)."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _put_dense(out, prefix, p):
    out[f"{prefix}.weight"] = _t(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _put_ln(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _put_ff(out, prefix, p):
    _put_dense(out, f"{prefix}.intermediate_dense", p["intermediate_dense"])
    _put_dense(out, f"{prefix}.output_dense", p["output_dense"])


def export_ebranchformer_ctc(
    params: Mapping[str, Any], config: EBranchformerConfig
) -> Dict[str, np.ndarray]:
    """Our param tree → reference Wav2Vec2EBranchformerForCTC state dict."""
    sd: Dict[str, np.ndarray] = {}
    w2v = params["wav2vec2"]

    fe = w2v["feature_extractor"]
    for i in range(len(config.conv_dim)):
        base = f"wav2vec2.feature_extractor.conv.{i}.0"
        if f"gate_{i}" in fe:
            sd[f"{base}.conv.conv.weight"] = _conv2d_inv(fe[f"conv_{i}"]["kernel"])
            sd[f"{base}.conv.conv.bias"] = np.asarray(fe[f"conv_{i}"]["bias"])
            sd[f"{base}.conv.gate.weight"] = _conv2d_inv(fe[f"gate_{i}"]["kernel"])
            sd[f"{base}.conv.gate.bias"] = np.asarray(fe[f"gate_{i}"]["bias"])
        else:
            sd[f"{base}.conv.weight"] = _conv2d_inv(fe[f"conv_{i}"]["kernel"])
            sd[f"{base}.conv.bias"] = np.asarray(fe[f"conv_{i}"]["bias"])
    _put_dense(sd, "wav2vec2.feature_extractor.out", fe["out"])

    fp = w2v["feature_projection"]
    _put_ln(sd, "wav2vec2.feature_projection.layer_norm", fp["layer_norm"])
    _put_dense(sd, "wav2vec2.feature_projection.projection", fp["projection"])

    enc = w2v["encoder"]
    _put_ln(sd, "wav2vec2.encoder.layer_norm", enc["layer_norm"])
    for i in range(config.num_hidden_layers):
        L = enc[f"layers_{i}"]
        p = f"wav2vec2.encoder.layers.{i}"
        if config.use_macaron_ff:
            _put_ln(sd, f"{p}.ff1.0", L["ff1_layer_norm"])
            _put_ff(sd, f"{p}.ff1.1", L["ff1"])
            _put_ln(sd, f"{p}.ff2.0", L["ff2_layer_norm"])
            _put_ff(sd, f"{p}.ff2.1", L["ff2"])
        _put_ln(sd, f"{p}.self_attn_layer_norm", L["self_attn_layer_norm"])
        attn = L["self_attn"]
        for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _put_dense(sd, f"{p}.self_attn.{name}", attn[name])
        if "linear_pos" in attn:
            sd[f"{p}.self_attn.linear_pos.weight"] = _t(attn["linear_pos"]["kernel"])
            sd[f"{p}.self_attn.pos_bias_u"] = np.asarray(attn["pos_bias_u"])
            sd[f"{p}.self_attn.pos_bias_v"] = np.asarray(attn["pos_bias_v"])
        _put_ln(sd, f"{p}.cgMLP_layer_norm", L["cgMLP_layer_norm"])
        cg = L["cgMLP"]
        _put_dense(sd, f"{p}.cgMLP.channel_proj1.0", cg["channel_proj1"])
        _put_ln(sd, f"{p}.cgMLP.csgu.norm", cg["csgu"]["norm"])
        sd[f"{p}.cgMLP.csgu.conv.weight"] = _conv1d_inv(cg["csgu"]["conv"]["kernel"])
        sd[f"{p}.cgMLP.csgu.conv.bias"] = np.asarray(cg["csgu"]["conv"]["bias"])
        if "linear" in cg["csgu"]:
            _put_dense(sd, f"{p}.cgMLP.csgu.linear", cg["csgu"]["linear"])
        _put_dense(sd, f"{p}.cgMLP.channel_proj2", cg["channel_proj2"])
        sd[f"{p}.depthwise_conv_fusion.weight"] = _conv1d_inv(
            L["depthwise_conv_fusion"]["kernel"]
        )
        sd[f"{p}.depthwise_conv_fusion.bias"] = np.asarray(
            L["depthwise_conv_fusion"]["bias"]
        )
        _put_dense(sd, f"{p}.merge_proj", L["merge_proj"])
        _put_ln(sd, f"{p}.final_layer_norm", L["final_layer_norm"])

    if "lm_head" in params:
        _put_dense(sd, "lm_head", params["lm_head"])
    if "blank_projection" in params:
        _put_dense(sd, "blank_projection", params["blank_projection"])
    return sd


def export_gpt2_decoder(
    params: Mapping[str, Any], config: GPT2DecoderConfig, prefix: str = ""
) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    p = prefix
    sd[f"{p}transformer.wte.weight"] = np.asarray(params["wte"]["embedding"])
    if "wpe" in params:
        sd[f"{p}transformer.wpe.weight"] = np.asarray(params["wpe"])
    _put_ln(sd, f"{p}transformer.ln_f", params["ln_f"])
    for i in range(config.n_layer):
        L = params[f"h_{i}"]
        b = f"{p}transformer.h.{i}"
        _put_ln(sd, f"{b}.ln_1", L["ln_1"])
        # Conv1D stores (in, out): our kernel maps verbatim.
        for ours, theirs in (("attn", "attn"),):
            sd[f"{b}.{theirs}.c_attn.weight"] = np.asarray(L[ours]["c_attn"]["kernel"])
            sd[f"{b}.{theirs}.c_attn.bias"] = np.asarray(L[ours]["c_attn"]["bias"])
            sd[f"{b}.{theirs}.c_proj.weight"] = np.asarray(L[ours]["c_proj"]["kernel"])
            sd[f"{b}.{theirs}.c_proj.bias"] = np.asarray(L[ours]["c_proj"]["bias"])
        if "crossattention" in L:
            ca = L["crossattention"]
            sd[f"{b}.crossattention.q_attn.weight"] = np.asarray(ca["q_attn"]["kernel"])
            sd[f"{b}.crossattention.q_attn.bias"] = np.asarray(ca["q_attn"]["bias"])
            sd[f"{b}.crossattention.c_attn.weight"] = np.asarray(ca["c_attn"]["kernel"])
            sd[f"{b}.crossattention.c_attn.bias"] = np.asarray(ca["c_attn"]["bias"])
            sd[f"{b}.crossattention.c_proj.weight"] = np.asarray(ca["c_proj"]["kernel"])
            sd[f"{b}.crossattention.c_proj.bias"] = np.asarray(ca["c_proj"]["bias"])
            _put_ln(sd, f"{b}.ln_cross_attn", L["ln_cross_attn"])
        _put_ln(sd, f"{b}.ln_2", L["ln_2"])
        sd[f"{b}.mlp.c_fc.weight"] = np.asarray(L["mlp_c_fc"]["kernel"])
        sd[f"{b}.mlp.c_fc.bias"] = np.asarray(L["mlp_c_fc"]["bias"])
        sd[f"{b}.mlp.c_proj.weight"] = np.asarray(L["mlp_c_proj"]["kernel"])
        sd[f"{b}.mlp.c_proj.bias"] = np.asarray(L["mlp_c_proj"]["bias"])
    if "lm_head" in params:
        sd[f"{p}lm_head.weight"] = _t(params["lm_head"]["kernel"])
    for k in range(len(config.head_locations)):
        key = f"additional_lm_heads_{k}"
        if key in params:
            sd[f"{p}additional_lm_heads.{k}.weight"] = _t(params[key]["kernel"])
    return sd


def export_joint(params, encoder_config, decoder_config) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    enc = export_ebranchformer_ctc(params["encoder"], encoder_config)
    sd.update({f"encoder.{k}": v for k, v in enc.items()})
    sd.update(export_gpt2_decoder(params["decoder"], decoder_config, "decoder."))
    if "enc_to_dec_proj" in params:
        _put_dense(sd, "enc_to_dec_proj", params["enc_to_dec_proj"])
    return sd


def save_torch_checkpoint(state_dict: Dict[str, np.ndarray], path: str):
    """Write a torch-loadable pytorch_model.bin (host-side tool)."""
    import torch

    torch.save({k: torch.tensor(v) for k, v in state_dict.items()}, path)
