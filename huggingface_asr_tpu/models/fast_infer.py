"""Fast CTC inference path: fused Pallas encoder layers over a Flax checkpoint.

``ctc_infer_fused(params, cfg, features, lengths)`` is a drop-in functional
equivalent of ``EBranchformerForCTC.apply(...)`` for the serving/benchmark
path (deterministic, non-causal, relative positions): the conv front end,
feature projection and CTC heads run as plain XLA, and each encoder layer
runs as ONE Pallas mega-kernel (ops/pallas_layer.py) that keeps activations
VMEM-resident for the whole layer.

Weight folding (``fold_layer_weights``) happens at trace time, so under jit
the folded tensors are computed once and live on device.

Restrictions (use the standard path otherwise): relative positions,
non-causal, no layer mixing / additional layer; T is padded to a multiple
of 8 internally.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.models.ebranchformer import (
    Conv2dFeatureExtractor,
    CTCOutput,
    FeatureProjection,
    feat_extract_output_frames,
    feat_extract_output_lengths,
)
from huggingface_asr_tpu.ops.lengths import lengths_to_mask
from huggingface_asr_tpu.ops.pallas_layer import (
    ebranchformer_layer,
    fold_layer_weights,
)
from huggingface_asr_tpu.ops.pallas_subsample import (
    conv_subsample_fused,
    fits_subsample_kernel,
)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def fused_encoder_ok(cfg: EBranchformerConfig, dtype) -> bool:
    """Static capability gate for the fused encoder (single source of truth
    for serving/pipeline.py and decoding/generate.py)."""
    from huggingface_asr_tpu.ops.pallas_layer import ACT_F32

    return (
        cfg.position_embeddings_type == "relative"
        and not cfg.is_causal
        and not cfg.finetune_with_layer_mixing
        and not cfg.finetune_with_additional_layer
        and cfg.use_macaron_ff
        and cfg.hidden_act in ACT_F32
        and cfg.csgu_activation in ACT_F32
        and dtype == jnp.bfloat16
    )


def ctc_infer_fused(
    params: Dict[str, Any],
    cfg: EBranchformerConfig,
    input_features: jnp.ndarray,     # (B, T_in, num_fbanks)
    input_lengths: jnp.ndarray,      # (B,)
    *,
    bb: int = 4,
    interpret: bool = False,
    ablate: str = "",
    return_hidden: bool = False,
) -> CTCOutput:
    if cfg.position_embeddings_type != "relative" or cfg.is_causal:
        raise ValueError("fused path supports non-causal relative-position models")
    if cfg.finetune_with_layer_mixing or cfg.finetune_with_additional_layer:
        raise ValueError("fused path does not support fine-tune adapters")
    dtype = jnp.bfloat16
    enc_p = params["wav2vec2"]

    T = int(feat_extract_output_frames(cfg, input_features.shape[1]))
    T_pad = _round_up(T, 8)
    if fits_subsample_kernel(cfg):
        # Fused Pallas subsampler (ops/pallas_subsample.py): conv1+conv2+
        # flatten+LN+projection in one VMEM-resident kernel; rows >= each
        # item's length are garbage and masked below.
        hidden = conv_subsample_fused(
            enc_p, cfg, input_features, T2_pad=T_pad, interpret=interpret
        )
    else:
        extract = Conv2dFeatureExtractor(cfg, dtype, name=None).apply(
            {"params": enc_p["feature_extractor"]}, input_features
        )
        hidden, _ = FeatureProjection(cfg, dtype, name=None).apply(
            {"params": enc_p["feature_projection"]}, extract, True
        )
        if T_pad != hidden.shape[1]:
            hidden = jnp.pad(
                hidden, ((0, 0), (0, T_pad - hidden.shape[1]), (0, 0))
            )

    # Reference length split (see models/ebranchformer.py): encoder masking
    # at the true padded-conv length, RETURNED lengths at the stock unpadded
    # formula the reference's ForCTC/joint paths use.
    enc_lengths = feat_extract_output_frames(cfg, input_lengths).astype(jnp.int32)
    enc_lengths = jnp.clip(enc_lengths, 0, T)
    out_lengths = feat_extract_output_lengths(cfg, input_lengths).astype(jnp.int32)
    out_lengths = jnp.clip(out_lengths, 0, T)

    B, _, D = hidden.shape
    mask = lengths_to_mask(enc_lengths, T_pad)
    x = jnp.where(mask[..., None], hidden, 0.0).astype(dtype)

    # Stack per-layer folded weights and lax.scan over layers: the traced
    # program then contains exactly ONE pallas_call, so Mosaic compiles the
    # layer kernel once instead of num_hidden_layers times.
    folded = [
        fold_layer_weights(enc_p["encoder"][f"layers_{i}"], cfg, T_pad)
        for i in range(cfg.num_hidden_layers)
    ]
    stacked = {k: jnp.stack([w[k] for w in folded]) for k in folded[0]}

    def body(h, layer_w):
        h = ebranchformer_layer(
            h, enc_lengths, layer_w, cfg, bb=bb, t_valid=T,
            interpret=interpret, ablate=ablate,
        )
        return h, None

    x, _ = jax.lax.scan(body, x, stacked)

    # final encoder LayerNorm (params["wav2vec2"]["encoder"]["layer_norm"])
    ln = enc_p["encoder"]["layer_norm"]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps)
    x = (
        xf * jnp.asarray(ln["scale"], jnp.float32)
        + jnp.asarray(ln["bias"], jnp.float32)
    ).astype(dtype)

    if T_pad != T:
        x = x[:, :T]

    vocab = jnp.dot(
        x, jnp.asarray(params["lm_head"]["kernel"], dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(params["lm_head"]["bias"], jnp.float32)
    blank = jnp.dot(
        x, jnp.asarray(params["blank_projection"]["kernel"], dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(params["blank_projection"]["bias"], jnp.float32)
    logits = jnp.concatenate([vocab, blank], axis=-1).astype(dtype)
    out = CTCOutput(logits=logits, logit_lengths=out_lengths, loss=None)
    if return_hidden:
        # post-final-LN hidden states — what the joint model's encode()
        # exposes for cross-attention (models/joint_ctc_aed.py:104)
        return out, x
    return out
