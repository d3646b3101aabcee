"""E-Branchformer CTC encoder family in Flax — TPU-native.

Behavioral twin of the reference architecture (reference:
src/models/encoders/e_branchformer.py, src/models/extractors.py,
src/models/streaming_modules.py) built from scratch for JAX/XLA:

  * 2-D conv front end over (B, T, mel) features (+ gated variants, causal
    streaming variants), then LayerNorm + projection.
  * Encoder layers: macaron FF (×0.5 residual) → parallel self-attention
    (Transformer-XL relative or rotary position embeddings) and cgMLP (CSGU)
    branches → concat → depthwise-conv fusion residual → merge projection →
    residual → macaron FF2 → final LayerNorm.
  * CTC head: vocab lm_head plus a SEPARATE 1-unit blank projection
    concatenated as the LAST logit (reference e_branchformer.py:456-457),
    fp32 CTC loss with blank = last index.

TPU-first choices: everything is static-shape and mask-driven; attention is
plain batched einsum (sequence lengths after 4× subsampling are ≤ ~500 for
20 s audio, so MXU-friendly dense attention beats exotic kernels); params are
stored fp32 and computed in a configurable ``dtype`` (bf16 for training).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from huggingface_asr_tpu.models.configs import EBranchformerConfig
from huggingface_asr_tpu.ops.ctc import ctc_loss as ctc_loss_fn
from huggingface_asr_tpu.ops.lengths import conv_output_length, lengths_to_mask

ACT = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "identity": lambda x: x,
}

# Additive mask value: -1e9 underflows to exp()=0 exactly like -float32.max
# (what torch uses) but stays finite under a bf16 cast — a fully-masked
# padding row then softmaxes to uniform instead of NaN.
NEG_INF = -1.0e9


@dataclasses.dataclass
class EncoderOutput:
    last_hidden_state: jnp.ndarray
    lengths: jnp.ndarray
    hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None
    extract_features: Optional[jnp.ndarray] = None


@dataclasses.dataclass
class CTCOutput:
    logits: jnp.ndarray
    logit_lengths: jnp.ndarray
    loss: Optional[jnp.ndarray] = None
    hidden_states: Optional[Tuple[jnp.ndarray, ...]] = None


def feat_extract_output_frames(config: EBranchformerConfig, input_lengths):
    """TENSOR frame count after the 2-D conv stack — the true convolution
    arithmetic including padding. Use for sizing arrays, never for valid
    lengths (see feat_extract_output_lengths)."""
    lengths = input_lengths
    for k, s, p in zip(config.conv_kernel, config.conv_stride, config.conv_padding):
        pad = (k - 1) if config.is_causal else 2 * p
        lengths = conv_output_length(lengths + pad, k, s, padding=0)
    return lengths


def feat_extract_output_lengths(config: EBranchformerConfig, input_lengths):
    """VALID frame count after the conv stack — replicates the reference's
    ``CustomFE._get_feat_extract_output_lengths`` (extractors.py:133-162)
    EXACTLY: ``(L - kernel) // stride + 1`` per layer, with NO padding term,
    although the convs themselves are padded. The reference therefore treats
    the trailing ``sum(padding)`` conv output frames of every utterance as
    padding — in the CTC loss, the attention masks, the decoder's
    cross-attention, and the CTC prefix scorer lengths alike. Round 3 found
    that using the mathematically-correct padded formula here silently
    de-synchronized joint beam decode from the reference (our decode saw 2
    extra trailing frames the reference masks), so the reference convention
    is mirrored verbatim."""
    lengths = input_lengths
    for k, s in zip(config.conv_kernel, config.conv_stride):
        lengths = conv_output_length(lengths, k, s, padding=0)
    if isinstance(lengths, (int, np.integer)):
        return max(int(lengths), 0)
    return jnp.maximum(lengths, 0) if isinstance(lengths, jnp.ndarray) else np.maximum(lengths, 0)


def _winit(cfg):
    """HF-matching Linear init (normal, std=initializer_range; reference
    inherits transformers Wav2Vec2PreTrainedModel._init_weights). Flax's
    lecun_normal default produces ~100x larger initial CTC gradients at these
    widths, which trips the grad-norm guard on every from-scratch step."""
    return nn.initializers.normal(stddev=cfg.initializer_range)


class Conv2dFeatureExtractor(nn.Module):
    """Stack of 2-D convs over (B, T, F) mel input + flatten + Linear → hidden.

    (An im2col-matmul formulation was benchmarked and lost to XLA's native
    conv lowering on these shapes — the k²·Cin patch tensor costs more HBM
    traffic than the conv saves in MXU efficiency.)
    """

    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        act = ACT[cfg.feat_extract_activation]
        x = features[..., None].astype(self.dtype)  # (B, T, F, 1) NHWC
        for i, (out_ch, k, s, p) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride, cfg.conv_padding)
        ):
            pad = [(k - 1, 0), (k - 1, 0)] if cfg.is_causal else [(p, p), (p, p)]
            conv = nn.Conv(
                out_ch, (k, k), strides=(s, s), padding=pad, dtype=self.dtype,
                name=f"conv_{i}",
            )
            if cfg.context_awareness_type == "gated":
                gate = nn.Conv(
                    out_ch, (k, k), strides=(s, s), padding=pad, dtype=self.dtype,
                    name=f"gate_{i}",
                )
                x = conv(x) * jax.nn.sigmoid(gate(x))
            elif cfg.context_awareness_type == "gated_shared":
                # One gate frame modulates `f` consecutive conv frames: the
                # gate conv runs at f× the kernel/stride/padding in time
                # (reference GatedConv2dShared, extractors.py:35-56).
                f = cfg.shared_scale_factor
                gpad = (
                    [(k * f - 1, 0), (k - 1, 0)]
                    if cfg.is_causal
                    else [(p * f, p * f), (p, p)]
                )
                gate = nn.Conv(
                    out_ch, (k * f, k), strides=(s * f, s), padding=gpad,
                    dtype=self.dtype, name=f"gate_{i}",
                )
                c = conv(x)
                g = jax.nn.sigmoid(gate(x))
                B_, Tc, F_, C_ = c.shape
                if Tc != g.shape[1] * f:
                    raise ValueError(
                        f"gated_shared needs conv time {Tc} == gate time "
                        f"{g.shape[1]} x {f}; pad inputs to a multiple of "
                        f"{f} post-conv frames"
                    )
                c = c.reshape(B_, g.shape[1], f, F_, C_) * g[:, :, None]
                x = c.reshape(B_, Tc, F_, C_)
            elif cfg.context_awareness_type not in (None, "none"):
                raise ValueError(
                    f"unknown context_awareness_type {cfg.context_awareness_type!r}"
                )
            else:
                x = conv(x)
            x = act(x)
        # (B, T', F', C) -> (B, T', C*F') with channel-major order to match
        # the reference's flatten of (B, T', C, F').
        B, T, F, C = x.shape
        x = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=_winit(cfg), name="out")(x)


class FeatureProjection(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        norm = nn.LayerNorm(epsilon=self.config.layer_norm_eps, dtype=self.dtype,
                            name="layer_norm")(x)
        proj = nn.Dense(self.config.hidden_size, dtype=self.dtype, name="projection")(norm)
        proj = nn.Dropout(self.config.feat_proj_dropout)(proj, deterministic=deterministic)
        return proj, norm


def relative_positional_embeddings(seq_len: int, d_model: int, dtype=jnp.float32):
    """Transformer-XL table, shape (2T-1, d_model): row i holds the sinusoid
    at relative position i - (T-1), so the gather row (t-s) + (T-1) yields
    PE[t-s] — POSITIVE offsets for keys to the LEFT of the query, matching
    the reference (HF Wav2Vec2ConformerRelPositionalEmbedding.extend_pe:
    "positive relative positions when keys are to the left (i>j)"). The
    round-2 table ran the OPPOSITE direction (PE[s-t]); invisible at init
    (HF scales linear_pos to std 0.02, bd ~1e-4) but a real mirror-image
    positional term on trained weights — caught by joint beam-search
    transcript parity in round 3."""
    pos = np.arange(-(seq_len - 1), seq_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    table = np.zeros((2 * seq_len - 1, d_model), dtype=np.float64)
    table[:, 0::2] = np.sin(pos * div)
    table[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(table, dtype=dtype)


def rotary_cos_sin(seq_len: int, head_size: int, base: int = 10000, dtype=jnp.float32):
    inv = 1.0 / (base ** (np.arange(0, head_size, 2, dtype=np.float64) / head_size))
    freqs = np.outer(np.arange(seq_len, dtype=np.float64), inv)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), dtype), jnp.asarray(np.sin(emb), dtype)


def _rel_shift(scores_bd: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL shift: (B, H, T, 2T-1) -> (B, H, T, T) with
    out[t, s] = in[t, t - s + T - 1] — with the ascending pos table
    (row i = position i - (T-1)) this selects PE[t - s], the reference
    convention. Realized as reverse + pad + two reshapes — no gather."""
    B, H, T, L = scores_bd.shape
    rev = scores_bd[..., ::-1]
    padded = jnp.pad(rev, ((0, 0), (0, 0), (0, 0), (0, 1)))  # (B,H,T,2T)
    flat = padded.reshape(B, H, T * (L + 1))[..., : T * L]
    return flat.reshape(B, H, T, L)[..., T - 1 : L]


class EBranchformerSelfAttention(nn.Module):
    """Multi-head self-attention with relative/rotary positions + causal option."""

    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, pos_emb=None, deterministic=True,
                 lengths=None):
        cfg = self.config
        B, T, D = x.shape
        H, dh = cfg.num_attention_heads, cfg.head_size

        qk_in = x
        if cfg.position_embeddings_type == "rotary":
            cos, sin = pos_emb
            h = x.reshape(B, T, H, dh)
            h1, h2 = h[..., : dh // 2], h[..., dh // 2 :]
            rotated = jnp.concatenate([-h2, h1], axis=-1)
            qk_in = (h * cos[None, :, None, :] + rotated * sin[None, :, None, :]).reshape(B, T, D)

        q = nn.Dense(D, dtype=self.dtype, kernel_init=_winit(cfg), name="linear_q")(qk_in).reshape(B, T, H, dh)
        k = nn.Dense(D, dtype=self.dtype, kernel_init=_winit(cfg), name="linear_k")(qk_in).reshape(B, T, H, dh)
        v = nn.Dense(D, dtype=self.dtype, kernel_init=_winit(cfg), name="linear_v")(x).reshape(B, T, H, dh)

        if cfg.position_embeddings_type == "relative":
            linear_pos = nn.Dense(
                D, use_bias=False, dtype=self.dtype, kernel_init=_winit(cfg),
                name="linear_pos",
            )
            bias_u = self.param("pos_bias_u", nn.initializers.zeros, (H, dh), jnp.float32)
            bias_v = self.param("pos_bias_v", nn.initializers.zeros, (H, dh), jnp.float32)
            q_u = q + bias_u.astype(self.dtype)
            q_v = q + bias_v.astype(self.dtype)

            # Fused Pallas attention core for INFERENCE (shift-form table
            # kernel — identical math to the relpos_impl strategies).
            if (
                cfg.attention_impl == "pallas"
                and deterministic
                and not cfg.is_causal
                and lengths is not None
                and pos_emb is not None
            ):
                from huggingface_asr_tpu.ops.pallas_attention import rel_attention

                pos = linear_pos(pos_emb).reshape(-1, H, dh)
                out = rel_attention(q_u, q_v, k, v, pos, lengths).reshape(B, T, D)
                return nn.Dense(D, dtype=self.dtype, kernel_init=_winit(cfg), name="linear_out")(out)

            if cfg.relpos_impl == "factored":
                # EXACT sinusoid-addition factorization of the Transformer-XL
                # positional term — no gather, no (2T-1) materialization, no
                # shift; every op is an MXU matmul. Derivation:
                #   bd[t,s] = q_v[t]^T (W_pos PE)[t-s+T-1]
                # and the table row at index t-s+T-1 holds the sinusoid at
                # angle w_i*(s-t), so with the addition theorem
                #   PE[s-t] = R(-w t) PE_std[s]
                # (R = per-frequency 2x2 rotation), giving
                #   bd[t,s] = rot_t(W_pos^T q_v[t]) . PE_std[s]
                # i.e. a rotary-transformed query contracted against the
                # ASCENDING standard table (pos_emb is not consumed here —
                # the tables below are the same sinusoids, re-indexed).
                eye = jnp.eye(D, dtype=self.dtype)
                wp = linear_pos(eye).reshape(D, H, dh)  # kernel (Din, H, dh)
                qw = jnp.einsum("bthd,Dhd->bthD", q_v, wp)  # (B, T, H, D)
                half = np.exp(
                    np.arange(0, D, 2, dtype=np.float64) * -(np.log(10000.0) / D)
                )
                angles = np.arange(T, dtype=np.float64)[:, None] * half
                cos_t = jnp.asarray(np.cos(angles), self.dtype)
                sin_t = jnp.asarray(np.sin(angles), self.dtype)
                r_cos = cos_t[None, :, None, :]
                r_sin = sin_t[None, :, None, :]
                qe, qo = qw[..., 0::2], qw[..., 1::2]
                # PE[t-s] (reference convention): sin(w(t-s)) = sin(wt)cos(ws)
                # - cos(wt)sin(ws), cos(w(t-s)) = cos(wt)cos(ws) +
                # sin(wt)sin(ws) -> sin-half coeff qo*sin - qe*cos, cos-half
                # qe*sin + qo*cos (the PE[s-t] form differs by qe -> -qe).
                q_rot = jnp.concatenate(
                    [r_sin * qo - r_cos * qe, r_sin * qe + r_cos * qo], axis=-1
                )  # (B, T, H, D): [rotated-sin | rotated-cos] halves
                k_std = jnp.concatenate([sin_t, cos_t], axis=-1)  # (T, D)

                # TRAINING Pallas path: flash-style custom-VJP kernel over
                # the factored scores — softmax/dropout/PV with the
                # (B, H, T, T) tensors VMEM-resident in fwd AND bwd, dropout
                # regenerated in-kernel from a per-step seed (the XLA
                # attention branch measured ~100 ms of the 240 ms B=64x10 s
                # step; validation/train_attrib.py r4).
                use_train_kernel = cfg.attention_impl == "pallas" or (
                    cfg.attention_impl == "auto"
                    and jax.default_backend() == "tpu"
                )
                if (
                    use_train_kernel
                    and not deterministic
                    and not cfg.is_causal
                    and lengths is not None
                ):
                    from huggingface_asr_tpu.ops.pallas_train_attention import (
                        rel_attention_train,
                    )

                    seed = jax.random.bits(
                        self.make_rng("dropout"), (), jnp.uint32
                    ).astype(jnp.int32)
                    out = rel_attention_train(
                        q_u, q_rot.astype(self.dtype), k, v, k_std, lengths,
                        seed, float(cfg.attention_dropout),
                    ).reshape(B, T, D)
                    # in-kernel dropout already applied to the probs
                    return nn.Dense(
                        D, dtype=self.dtype, kernel_init=_winit(cfg),
                        name="linear_out",
                    )(out)

                scores_ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
                scores_bd = jnp.einsum("bthD,sD->bhts", q_rot, k_std)
                scores = (scores_ac + scores_bd) / jnp.sqrt(dh).astype(self.dtype)
            else:
                pos = linear_pos(pos_emb)
                pos = pos.reshape(-1, H, dh)  # (2T-1, H, dh)

                scores_ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
                if cfg.relpos_impl == "shift":
                    # One large MXU matmul over the raw (2T-1) table, then the
                    # Transformer-XL pad/reshape shift. The (t,h)-batched gather
                    # contraction below is latency-bound at inference (T*H tiny
                    # grouped matmuls); this form is a single big dot.
                    bd_all = jnp.einsum("bthd,rhd->bhtr", q_v, pos)  # (B,H,T,2T-1)
                    scores_bd = _rel_shift(bd_all)
                else:
                    # Gathered-table contraction — avoids materializing the
                    # (B, H, T, 2T-1) tensor; measured faster for TRAINING on
                    # v5e (scatter-add backward beats the shift path's extra
                    # materializations); math identical either way.
                    d_idx = (
                        jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + (T - 1)
                    )  # (T, T) relative-offset index into the 2T-1 table
                    pos_g = pos[d_idx]  # (T, T, H, dh)
                    scores_bd = jnp.einsum("bthd,tshd->bhts", q_v, pos_g)
                scores = (scores_ac + scores_bd) / jnp.sqrt(dh).astype(self.dtype)
        else:
            scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(dh).astype(self.dtype)

        if cfg.attention_softmax_fp32:
            scores = scores.astype(jnp.float32)
            neg = NEG_INF
        else:
            neg = jnp.asarray(-1e9, scores.dtype)
        if cfg.is_causal:
            causal = jnp.tril(jnp.ones((T, T), dtype=bool))
            scores = jnp.where(causal[None, None], scores, neg)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=deterministic)

        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, kernel_init=_winit(cfg), name="linear_out")(out)


class FeedForward(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype, kernel_init=_winit(cfg), name="intermediate_dense")(x)
        x = ACT[cfg.hidden_act](x)
        x = nn.Dropout(cfg.activation_dropout)(x, deterministic=deterministic)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=_winit(cfg), name="output_dense")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class _DWConvParams(nn.Module):
    """Parameter shell matching ``nn.Conv``'s tree exactly (``kernel``
    ``(k, 1, C)``, ``bias`` ``(C,)``) so checkpoints are interchangeable
    between the two ``dwconv_impl`` evaluations."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


def _dwconv_1d(parent_cfg, x, features, kernel_size, dtype, name):
    """Depthwise 1-D cross-correlation (torch ``nn.Conv1d(groups=C)``
    semantics — reference e_branchformer.py cgMLP/merge convs), evaluated per
    ``config.dwconv_impl``:

    - ``"conv"``: ``nn.Conv`` → lax grouped conv (input grad lowers to a
      grouped transposed conv).
    - ``"slice"``: pad once, accumulate ``k`` static-slice FMAs
      ``sum_j x_pad[:, j:j+T, :] * kernel[j, 0, :]``; autodiff of this form
      stays pads/muls/reductions. Same math, accumulation order differs
      (fp tolerance, not byte-identical) — keep "conv" on parity-gated
      decode paths.
    """
    k = kernel_size
    pad = (k - 1, 0) if parent_cfg.is_causal else ((k - 1) // 2, (k - 1) // 2)
    if parent_cfg.dwconv_impl != "slice":
        return nn.Conv(
            features, (k,), padding=[pad], feature_group_count=features,
            dtype=dtype, name=name,
        )(x)
    kernel, bias = _DWConvParams(features, k, name=name)()
    kernel = kernel.astype(dtype)
    T = x.shape[1]
    x_pad = jnp.pad(x.astype(dtype), ((0, 0), pad, (0, 0)))
    acc = x_pad[:, 0:T, :] * kernel[0, 0]
    for j in range(1, k):
        acc = acc + x_pad[:, j:j + T, :] * kernel[j, 0]
    return acc + bias.astype(dtype)


class ConvolutionalSpatialGatingUnit(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        n = cfg.intermediate_size // 2
        x_r, x_g = jnp.split(x, 2, axis=-1)
        x_g = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x_g)
        x_g = _dwconv_1d(cfg, x_g, n, cfg.csgu_kernel_size, self.dtype, "conv")
        if cfg.csgu_use_linear_after_conv:
            x_g = nn.Dense(n, dtype=self.dtype, kernel_init=_winit(cfg), name="linear")(x_g)
        x_g = ACT[cfg.csgu_activation](x_g)
        out = x_r * x_g
        return nn.Dropout(cfg.csgu_conv_dropout)(out, deterministic=deterministic)


class ConvolutionalGatingMLP(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype, kernel_init=_winit(cfg), name="channel_proj1")(x)
        x = ACT["gelu"](x)
        x = ConvolutionalSpatialGatingUnit(cfg, self.dtype, name="csgu")(x, deterministic)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=_winit(cfg), name="channel_proj2")(x)


class EBranchformerEncoderLayer(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_bias=None, pos_emb=None, deterministic=True,
                 lengths=None):
        cfg = self.config
        drop = lambda h: nn.Dropout(cfg.attention_dropout)(h, deterministic=deterministic)

        if cfg.use_macaron_ff:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="ff1_layer_norm")(x)
            x = x + 0.5 * FeedForward(cfg, self.dtype, name="ff1")(h, deterministic)

        residual = x
        g = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        g = EBranchformerSelfAttention(cfg, self.dtype, name="self_attn")(
            g, attention_bias, pos_emb, deterministic, lengths=lengths
        )
        g = drop(g)

        l = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="cgMLP_layer_norm")(x)
        l = ConvolutionalGatingMLP(cfg, self.dtype, name="cgMLP")(l, deterministic)

        merged = jnp.concatenate([g, l], axis=-1)
        fused = _dwconv_1d(cfg, merged, 2 * cfg.hidden_size,
                           cfg.merge_conv_kernel, self.dtype,
                           "depthwise_conv_fusion")
        merged = merged + fused
        merged = nn.Dense(cfg.hidden_size, dtype=self.dtype, kernel_init=_winit(cfg), name="merge_proj")(merged)
        x = residual + drop(merged)

        if cfg.use_macaron_ff:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="ff2_layer_norm")(x)
            x = x + 0.5 * FeedForward(cfg, self.dtype, name="ff2")(h, deterministic)

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)


class EBranchformerEncoder(nn.Module):
    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True, output_hidden_states=False,
                 lengths=None):
        cfg = self.config
        B, T, D = x.shape

        attention_bias = None
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
            attention_bias = jnp.where(mask, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)

        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        pos_emb = None
        if cfg.position_embeddings_type == "relative":
            pos_emb = relative_positional_embeddings(T, D, self.dtype)
        elif cfg.position_embeddings_type == "rotary":
            pos_emb = rotary_cos_sin(T, cfg.head_size, cfg.rotary_embedding_base, self.dtype)

        layer_cls = EBranchformerEncoderLayer
        if cfg.remat:
            # static_argnums counts self=0: deterministic is argument 4.
            layer_cls = nn.remat(EBranchformerEncoderLayer, static_argnums=(4,))

        all_hidden = [] if output_hidden_states else None
        for i in range(cfg.num_hidden_layers):
            if output_hidden_states:
                all_hidden.append(x)
            x = layer_cls(cfg, self.dtype, name=f"layers_{i}")(
                x, attention_bias, pos_emb, deterministic, lengths
            )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm")(x)
        if output_hidden_states:
            all_hidden.append(x)
            return x, tuple(all_hidden)
        return x, None


class EBranchformerModel(nn.Module):
    """FE conv stack → feature projection → encoder (reference e_branchformer.py:325-334)."""

    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        mask_time_indices: Optional[jnp.ndarray] = None,
        mask_noise: Optional[jnp.ndarray] = None,
    ) -> EncoderOutput:
        cfg = self.config
        B, T_in, _ = input_features.shape
        if input_lengths is None:
            input_lengths = jnp.full((B,), T_in, dtype=jnp.int32)

        extract = Conv2dFeatureExtractor(cfg, self.dtype, name="feature_extractor")(
            input_features
        )
        hidden, norm_features = FeatureProjection(cfg, self.dtype, name="feature_projection")(
            extract, deterministic
        )

        # SSL masking hook: replace masked frames (BEST-RQ noise or learned emb).
        if mask_time_indices is not None:
            if mask_noise is not None:
                hidden = jnp.where(mask_time_indices[..., None], mask_noise, hidden)
            else:
                mask_emb = self.param(
                    "masked_spec_embed",
                    nn.initializers.uniform(scale=1.0),
                    (cfg.hidden_size,),
                    jnp.float32,
                )
                hidden = jnp.where(
                    mask_time_indices[..., None], mask_emb.astype(self.dtype), hidden
                )

        # Two DIFFERENT length conventions, mirroring the reference exactly:
        #   * the ENCODER's attention/zeroing mask uses the true padded-conv
        #     arithmetic (the reference's Wav2Vec2EBranchformerModel resolves
        #     _get_feat_extract_output_lengths to CustomFE's padded formula,
        #     extractors.py:133-162);
        #   * the RETURNED lengths (CTC loss, greedy/beam decode, the joint
        #     model's cross-attention + CTC prefix scorer) use the stock HF
        #     wav2vec2 UNPADDED formula — Wav2Vec2EBranchformerForCTC
        #     inherits Wav2Vec2ForCTC, whose formula ignores conv padding, so
        #     the reference trains and decodes with the last sum(2*padding)
        #     frames excluded even though the encoder attends them.
        enc_lengths = feat_extract_output_frames(cfg, input_lengths).astype(jnp.int32)
        enc_lengths = jnp.clip(enc_lengths, 0, hidden.shape[1])
        mask = lengths_to_mask(enc_lengths, hidden.shape[1])

        out_lengths = feat_extract_output_lengths(cfg, input_lengths).astype(jnp.int32)
        out_lengths = jnp.clip(out_lengths, 0, hidden.shape[1])

        last, all_hidden = EBranchformerEncoder(cfg, self.dtype, name="encoder")(
            hidden, mask, deterministic, output_hidden_states, lengths=enc_lengths
        )
        return EncoderOutput(
            last_hidden_state=last,
            lengths=out_lengths,
            hidden_states=all_hidden,
            extract_features=norm_features,
        )


class EBranchformerForCTC(nn.Module):
    """CTC model: encoder + vocab head + separate blank projection (last logit)."""

    config: EBranchformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_features: jnp.ndarray,
        input_lengths: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        label_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
    ) -> CTCOutput:
        cfg = self.config
        need_hidden = output_hidden_states or cfg.finetune_with_layer_mixing
        enc = EBranchformerModel(cfg, self.dtype, name="wav2vec2")(
            input_features, input_lengths, deterministic, need_hidden
        )

        if cfg.finetune_with_layer_mixing:
            # Learned per-layer weighted sum of hidden states (reference
            # bestrq.py:239-243): softmax over num_hidden_layers+1 weights
            # initialized to select the last layer.
            init = np.zeros(cfg.num_hidden_layers + 1, np.float32)
            init[-1] = 1.0
            w = self.param("per_layer_weights", lambda *_: jnp.asarray(init))
            stacked = jnp.stack(enc.hidden_states, axis=0)
            mix = jax.nn.softmax(w.astype(jnp.float32))[:, None, None, None]
            hidden_mixed = jnp.sum(stacked.astype(jnp.float32) * mix, axis=0).astype(
                self.dtype
            )
        else:
            hidden_mixed = enc.last_hidden_state

        if cfg.finetune_with_additional_layer:
            # Extra trainable E-Branchformer layer on top of the (frozen) SSL
            # body (reference bestrq.py:247-275).
            T_enc = hidden_mixed.shape[1]
            mask = lengths_to_mask(enc.lengths, T_enc)
            h = jnp.where(mask[..., None], hidden_mixed, 0.0)
            bias = jnp.where(mask, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)
            pos_emb = None
            if cfg.position_embeddings_type == "relative":
                pos_emb = relative_positional_embeddings(
                    T_enc, cfg.hidden_size, self.dtype
                )
            elif cfg.position_embeddings_type == "rotary":
                pos_emb = rotary_cos_sin(
                    T_enc, cfg.head_size, cfg.rotary_embedding_base, self.dtype
                )
            hidden_mixed = EBranchformerEncoderLayer(
                cfg, self.dtype, name="additional_layer"
            )(h, bias, pos_emb, deterministic)

        hidden = nn.Dropout(cfg.final_dropout)(hidden_mixed, deterministic=deterministic)
        vocab_logits = nn.Dense(cfg.vocab_size, dtype=self.dtype, kernel_init=_winit(cfg), name="lm_head")(hidden)
        blank_logit = nn.Dense(1, dtype=self.dtype, kernel_init=_winit(cfg), name="blank_projection")(hidden)
        logits = jnp.concatenate([vocab_logits, blank_logit], axis=-1)

        loss = None
        if labels is not None:
            loss = ctc_loss_fn(
                logits.astype(jnp.float32),
                enc.lengths,
                labels,
                label_lengths,
                blank_id=-1,
                reduction=cfg.ctc_loss_reduction,
            )
        return CTCOutput(
            logits=logits,
            logit_lengths=enc.lengths,
            loss=loss,
            hidden_states=enc.hidden_states if output_hidden_states else None,
        )
