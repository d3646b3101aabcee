"""Model configuration dataclasses.

Field names mirror the reference's HF configs (reference:
src/models/encoders/e_branchformer.py:37-61, src/models/extractors.py:13-20)
so that checkpoint conversion and config interop are mechanical, but these are
plain dataclasses — no HF runtime dependency.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EBranchformerConfig:
    """E-Branchformer encoder (+ 2-D conv mel front end) configuration."""

    # Core transformer
    hidden_size: int = 256
    num_hidden_layers: int = 12
    num_attention_heads: int = 4
    intermediate_size: int = 1024
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5
    initializer_range: float = 0.02

    # Dropouts
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    final_dropout: float = 0.1
    layerdrop: float = 0.0

    # Attention score/softmax accumulation in fp32 (parity/training default).
    # False keeps scores in the compute dtype (bf16) — halves the HBM traffic
    # of the (B,H,T,T) score tensors for serving.
    attention_softmax_fp32: bool = True
    # "xla" | "pallas": pallas = fused VMEM-resident rel-pos attention kernel
    # (inference path; relative positions, non-causal).
    # "auto": XLA attention everywhere EXCEPT training steps on TPU, which
    # use the fused custom-VJP Pallas kernel (ops/pallas_train_attention.py
    # — measured 132.7 -> 118.4 ms on the B=64x10 s train step). "pallas"
    # forces both the training kernel and the inference kernel
    # (ops/pallas_attention.py); "xla" disables both. Inference through
    # model.apply stays XLA under "auto" — but note the decode CLIs
    # (evaluate.py, generate_joint) separately default fused_encoder="auto",
    # which on TPU routes eligible encoders through the bf16 fused serving
    # kernel; pass --fused_encoder off there to force the exact XLA op order
    # for parity runs.
    attention_impl: str = "auto"  # auto | xla | pallas
    # Relative-position term evaluation: "gather" contracts a (T,T,H,dh)
    # gathered table; "shift" is one big (B*T*H,dh)x(dh,2T-1) MXU matmul +
    # Transformer-XL shift (bitwise-equal scores); "factored" is the exact
    # sinusoid-addition factorization (rotate the pos-projected query by -w*t,
    # contract against the ascending table) — pure MXU, no gather/shift.
    # Default "factored": measured fastest for BOTH the fwd path and the
    # train step (gather costs +31 ms/step at B=64x10 s on v5e — the gathered
    # (T,T,H,dh) table is the difference; validation/train_attrib.py r4).
    relpos_impl: str = "factored"  # gather | shift | factored
    # Depthwise-conv evaluation in the XLA (training) path: "conv" lowers to
    # lax.conv_general_dilated with feature groups; "slice" evaluates the same
    # cross-correlation as k static-slice FMAs over a once-padded buffer, so
    # the autodiff backward is also slice-FMAs (pad/mul/reduce) instead of the
    # grouped transposed-conv lowering. Param tree is identical either way
    # (kernel (k,1,C) + bias (C,) under the same module name). Numerics differ
    # only in accumulation order — keep "conv" wherever decode parity gates
    # byte-identical transcripts; the training CLIs may flip to "slice" purely
    # for step time (training numerics are not parity-gated).
    dwconv_impl: str = "conv"  # conv | slice
    # Rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades ~30% step FLOPs for O(layers) activation memory — the lever for
    # scaling batch size / sequence length.
    remat: bool = False
    # Positional embeddings: "relative" | "rotary" | "none"
    position_embeddings_type: str = "relative"
    max_source_positions: int = 5000
    rotary_embedding_base: int = 10000

    # 2-D conv front end over (T, num_fbanks) mel features
    num_fbanks: int = 80
    conv_dim: Tuple[int, ...] = (256, 256)
    conv_kernel: Tuple[int, ...] = (3, 3)
    conv_stride: Tuple[int, ...] = (2, 2)
    conv_padding: Tuple[int, ...] = (1, 1)
    feat_extract_activation: str = "gelu"
    context_awareness_type: Optional[str] = None  # None | "gated" | "gated_shared"
    # gated_shared: one gate frame modulates this many conv output frames
    # (reference GatedConv2dShared, extractors.py:35-56).
    shared_scale_factor: int = 4

    # E-Branchformer specifics
    csgu_kernel_size: int = 31
    csgu_activation: str = "identity"
    csgu_conv_dropout: float = 0.1
    csgu_use_linear_after_conv: bool = False
    merge_conv_kernel: int = 31
    use_macaron_ff: bool = True
    is_causal: bool = False

    # CTC head
    vocab_size: int = 500
    ctc_loss_reduction: str = "mean"
    ctc_zero_infinity: bool = True

    # SSL masking (hidden-state masking for wav2vec2-style pretraining)
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    mask_feature_min_masks: int = 0

    # wav2vec2 Gumbel quantizer (contrastive SSL)
    num_codevectors_per_group: int = 320
    num_codevector_groups: int = 2
    contrastive_logits_temperature: float = 0.1
    num_negatives: int = 100
    codevector_dim: int = 256
    proj_codevector_dim: int = 256
    diversity_loss_weight: float = 0.1
    feat_quantizer_dropout: float = 0.0

    # BEST-RQ (reference src/models/bestrq.py:31-41)
    best_rq_codebook_size: int = 8192
    best_rq_codebook_dim: int = 16
    best_rq_num_books: int = 1
    best_rq_in_dim: int = 320  # stacked mel frames per encoder frame

    # BEST-RQ fine-tuning adapters (reference bestrq.py:155-168)
    finetune_with_additional_layer: bool = False
    finetune_with_layer_mixing: bool = False
    freeze_norm_for_finetunning: bool = False

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "EBranchformerConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in fields}
        for key in ("conv_dim", "conv_kernel", "conv_stride", "conv_padding"):
            if key in kwargs and isinstance(kwargs[key], list):
                kwargs[key] = tuple(kwargs[key])
        return cls(**kwargs)

    @classmethod
    def from_hf_config(cls, hf_config) -> "EBranchformerConfig":
        """Build from a reference/HF Wav2Vec2EBranchformerConfig instance or dict."""
        d = hf_config if isinstance(hf_config, dict) else hf_config.to_dict()
        if "ebranchformer_conv_dropout" in d:
            d.setdefault("csgu_conv_dropout", d["ebranchformer_conv_dropout"])
        pet = d.get("position_embeddings_type")
        if pet is None:
            d["position_embeddings_type"] = "none"
        cp = d.get("conv_padding", (1, 1))
        if isinstance(cp, int):
            d["conv_padding"] = tuple([cp] * len(d.get("conv_kernel", (3, 3))))
        return cls.from_dict(d)


def parse_dtype(name: str) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]
