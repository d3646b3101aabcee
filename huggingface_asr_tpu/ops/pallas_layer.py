"""Fused E-Branchformer encoder layer — single Pallas TPU mega-kernel.

Inference-path replacement for ``EBranchformerEncoderLayer`` (non-causal,
relative positions, deterministic). The XLA layer is memory-bound at these
widths (D=256): ~10 matmuls plus 6 LayerNorms, 2 depthwise convs, softmax and
gating each round-trip the (B, T, ·) activations through HBM. This kernel
keeps one block of batches fully VMEM-resident for the WHOLE layer — HBM
traffic collapses to x-in + x-out + weights (weights are loaded once: their
BlockSpec index map is constant, so Mosaic keeps them resident across grid
steps).

Design notes:
  * Relative positions use the EXACT sinusoid-addition factorization (see
    ``relpos_impl="factored"`` in models/ebranchformer.py): the positional
    term becomes ``rot_t(W_pos^T q_v[t]) . PE_std[s]`` — a clean K=D MXU
    matmul per (batch, head); no gather, no Transformer-XL shift. The
    composite map input → PE-coefficients factors through the head's
    query space, so it has rank <= dh; the kernel computes it LOW-RANK
    (``qv_h @ Wp_h^T``, K=dh) instead of folding a dense (D, D) matrix —
    ~8x fewer positional-path FLOPs than the round-2 kernel.
  * The 1/sqrt(dh) attention scale is pre-folded into W_q and both attention
    bias vectors (``fold_layer_weights``), removing a (bb,T,T) multiply per
    head; softmax division is applied AFTER the probs @ V matmul on the
    (bb,T,dh) output instead of the (bb,T,T) probs.
  * GELU (erf) is computed by the Abramowitz-Stegun 7.1.28 rational bound
    (|err| <= 3e-7, far below bf16 resolution) — no transcendental, no
    per-element exp: 6 FMAs + 4 squarings + one divide.
  * Depthwise convs (CSGU kernel-31 and merge-fusion kernel-31) are computed
    from a zero-padded fp32 VMEM buffer with K static-offset slice-FMAs —
    pure VPU, fp32 accumulation, no per-tap dtype conversions.
  * Grid is (B // bb,); per-program VMEM is ~10 MB of activations at bb=4,
    T=256 plus ~4 MB of resident weights.

Semantics match the XLA layer at the same UNPADDED T: rows below ``t_valid``
(the pre-padding frame count) flow through LN/FF/conv identically in both
implementations; rows in [t_valid, T) — present only because the kernel pads
T to a sublane multiple — are masked out of both depthwise convs, so they
can never contaminate valid frames (attention already masks key columns by
true length). Parity is asserted by tests/test_pallas_layer.py.

Reference behavior spec: /root/reference/src/models/encoders/e_branchformer.py
(Wav2Vec2EBranchformerEncoderLayer.forward, :263-313).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7). Uses exp — kept
    for reference/validation; the kernel path uses ``_erf_rational``."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_rational(x):
    """erf via Abramowitz-Stegun 7.1.28: 1 - 1/(1 + a1 x + ... + a6 x^6)^16
    for x >= 0 (|err| <= 3e-7 — far below bf16 resolution). No exp, no
    transcendental: 6 FMAs, 4 squarings, one divide. ~2x cheaper than 7.1.26
    on the TPU VPU, whose exp is a multi-pass polynomial itself."""
    a1, a2, a3, a4, a5, a6 = (
        0.0705230784, 0.0422820123, 0.0092705272,
        0.0001520143, 0.0002765672, 0.0000430638,
    )
    ax = jnp.abs(x)
    p = ((((((a6 * ax + a5) * ax + a4) * ax + a3) * ax + a2) * ax + a1) * ax
         + 1.0)
    p2 = p * p
    p4 = p2 * p2
    p8 = p4 * p4
    p16 = p8 * p8
    e = 1.0 - 1.0 / p16
    return jnp.sign(x) * e


RECIP_MODE = "newton"  # "off" (exact divide) | "newton" (approx + 1 Newton
                    # step, ~1 f32 ulp — DEFAULT: measured ~1 ms/batch
                    # cheaper than the exact divide in the subsampler alone,
                    # and a 1-ulp f32 reciprocal cannot move any bf16
                    # result) | "approx" (raw VPU reciprocal, rel err
                    # ~2^-14 — still ~60x below bf16 resolution).
                    # The erfc rational divides by p^16 in [1, 4e6]; an
                    # approx reciprocal perturbs erfc by <=6e-5 absolute,
                    # flipping only bf16 values within 6e-5 of a rounding
                    # boundary. Kernels read it at trace time so harnesses
                    # can set it per-variant.


SOFTMAX_Z_MODE = "vpu"  # "vpu": z = jnp.sum(e) — a full VPU reduction pass
                        # over the (bb, T, T) exp'd scores per head.
                        # "mxu": append a ones column to V and read z from
                        # the probs@V matmul's extra lane — the MXU N dim
                        # is dh(=32) of 128 lanes either way, so the sum is
                        # FREE on the MXU and the VPU pass disappears.
                        # z then sums bf16-rounded e in the MXU's f32 tree
                        # (vs f32 e on the VPU) — a ~2^-8-relative z
                        # perturbation on a value that only normalizes
                        # probs; transcript-gated like the other modes.

SOFTMAX_M_MODE = "rowmax"  # "rowmax": m = max(scores, -1) — the standard
                           # stabilizer; a full (bb, T, T) reduction pass
                           # per head that also SERIALIZES the pipeline
                           # (exp2 cannot start until the row sweep ends).
                           # "skip": e = exp2(scores - BOUND) with a static
                           # bound — removes the reduction; exact softmax
                           # as long as nothing over/underflows: scores are
                           # log2-scaled logits (|.| <= ~90 on trained
                           # checkpoints), f32 exp2 overflows at 128 and
                           # z's guard (max(z, 1e-30)) catches full-row
                           # underflow. Transcript-gated on BOTH corpora
                           # (validation/fused_mode_check.py) like every
                           # serving mode.
SOFTMAX_M_BOUND = 32.0

ATTN_OUT_MODE = "assembled"  # "distributed" | "assembled" — see the
                             # attention-branch comment in _layer_kernel.
                             # Trace-time knob; measured on chip (12-layer
                             # scan, B=128, T=256, bb=8): assembled
                             # 3.139 ms/layer vs distributed 3.191 — the
                             # full-K output dot beats the K=dh per-head
                             # dots' scheduling freedom. (bb=16: 3.99 —
                             # bb=8 stays the default.)


def _recip(x):
    """fp32 reciprocal; see RECIP_MODE."""
    if RECIP_MODE == "approx":
        return pl.reciprocal(x, approx=True)
    if RECIP_MODE == "newton":
        r = pl.reciprocal(x, approx=True)
        return r * (2.0 - x * r)
    return 1.0 / x


def _erfc_rational(x):
    """erfc via the same A&S 7.1.28 rational: for x >= 0 the tail 1/p^16 is
    computed DIRECTLY (no 1-erf cancellation — exact relative accuracy in
    the tail); erfc(-x) = 2 - erfc(x)."""
    a1, a2, a3, a4, a5, a6 = (
        0.0705230784, 0.0422820123, 0.0092705272,
        0.0001520143, 0.0002765672, 0.0000430638,
    )
    ax = jnp.abs(x)
    p = ((((((a6 * ax + a5) * ax + a4) * ax + a3) * ax + a2) * ax + a1) * ax
         + 1.0)
    # p**16 overflows f32 once p > ~258 (ax ~ 13); inf then poisons the
    # Newton-refined reciprocal (r*(2 - inf*r) = NaN). Clamp p so the power
    # chain stays finite: below the clamp every bit is unchanged, above it
    # the tail 1/250^16 = 4.3e-39 rounds to a bf16 subnormal ~0, which is
    # where the true erfc (< 1e-74) already is.
    p = jnp.minimum(p, 250.0)
    p2 = p * p
    p4 = p2 * p2
    p8 = p4 * p4
    inv = _recip(p8 * p8)
    # True erfc underflows f32 (< 1.4e-45) past ax ~ 10.06 — flush the
    # rational's polynomially-decaying tail to the exact limit there, like
    # XLA's erfc does; otherwise gelu(x) = 0.5*x*tail can resurrect a
    # visible value for extreme |x| (0.5 * 3e38 * 4.3e-39 = 0.64).
    inv = jnp.where(ax > 10.06, 0.0, inv)
    return jnp.where(x >= 0, inv, 2.0 - inv)


_SQRT_HALF_BF16 = 0.70703125  # float(jnp.bfloat16(np.sqrt(0.5)))


def _gelu_bf16(x_bf):
    """Bit-exact replica of ``jax.nn.gelu(x, approximate=False)`` on bf16
    (what the XLA model path applies): XLA evaluates ``0.5 * x *
    erfc(-x * bf16(sqrt(1/2)))`` with every elementwise op rounded to bf16
    and erfc computed in f32, rounded once. |erfc err| <= 3e-7 in f32."""
    f32, bf = jnp.float32, jnp.bfloat16
    xf = x_bf.astype(f32)
    u = (xf * (-_SQRT_HALF_BF16)).astype(bf).astype(f32)
    e = _erfc_rational(u).astype(bf).astype(f32)
    half = (xf * 0.5).astype(bf).astype(f32)
    return (half * e).astype(bf)


_SQRT_HALF = 0.7071067811865476


def _gelu_exact(x):
    """Exact (erf-based) GELU to fp32 accuracy ~3e-7 — matches
    jax.nn.gelu(approximate=False) within bf16 resolution."""
    return 0.5 * x * (1.0 + _erf_rational(x * _SQRT_HALF))


GELU_MODE = "bitexact"  # "bitexact" replicates the XLA bf16 rounding chain
                        # op for op (_gelu_bf16: ~25 VPU ops/element);
                        # "fast" computes the same erfc-based GELU entirely
                        # in f32 with ONE final bf16 rounding (~16 ops) —
                        # |difference| <= 1-2 bf16 ulp from the dropped
                        # intermediate roundings; "fastest" additionally
                        # swaps the erfc rational for A&S 7.1.27 (|erfc err|
                        # <= 5e-4 — still ~16x below bf16's 2^-8 resolution;
                        # ~9 ops). Trace-time knob; the serving/bench path
                        # may enable a faster mode only behind a
                        # fused-transcript parity re-validation
                        # (validation/fused_mode_check.py).


def _gelu_fast(x_bf):
    """f32 GELU, one bf16 rounding: 0.5*x*erfc(-x*sqrt(1/2)) with the A&S
    7.1.28 erfc. Same function as _gelu_bf16 minus the intermediate bf16
    roundings (<= 1-2 bf16 ulp difference), ~35% fewer VPU ops."""
    xf = x_bf.astype(jnp.float32)
    return (0.5 * xf * _erfc_rational(xf * (-_SQRT_HALF))).astype(jnp.bfloat16)


def _erfc_rational4(x):
    """erfc via A&S 7.1.27: 1/(1 + a1 x + .. + a4 x^4)^4 for x >= 0,
    |err| <= 5e-4 absolute — 2^-8 (bf16 resolution) is 3.9e-3, so a GELU
    built on this is within ~1/8 bf16 ulp of exact for all |x|. 4 FMAs,
    2 squarings, one reciprocal."""
    a1, a2, a3, a4 = 0.278393, 0.230389, 0.000972, 0.078108
    ax = jnp.abs(x)
    p = ((((a4 * ax + a3) * ax + a2) * ax + a1) * ax + 1.0)
    # Same inf-safety clamp as _erfc_rational: p**4 overflows f32 only at
    # p > 4.3e9 (ax ~ 485 — absurd but representable in bf16); keep the
    # Newton reciprocal NaN-free for every finite input.
    p = jnp.minimum(p, 1.0e9)
    p2 = p * p
    inv = _recip(p2 * p2)
    # Same f32-underflow flush as _erfc_rational (true erfc < 1.4e-45 past
    # ax ~ 10.06): this rational's ax**-16 tail decays far too slowly —
    # without the flush, gelu(-3e38) = 0.5 * 3e38 * 1/p(2.1e38)^4 = -150.
    inv = jnp.where(ax > 10.06, 0.0, inv)
    return jnp.where(x >= 0, inv, 2.0 - inv)


def _gelu_fastest(x_bf):
    """f32 GELU with the 7.1.27 erfc (|gelu err| <= 2.5e-4*|x| — far below
    one bf16 ulp of the value), one final bf16 rounding. ~9 VPU
    ops/element vs bitexact's ~25."""
    xf = x_bf.astype(jnp.float32)
    return (0.5 * xf * _erfc_rational4(xf * (-_SQRT_HALF))).astype(jnp.bfloat16)


def gelu_bf16(x_bf):
    """bf16 GELU dispatcher for the fused kernels (reads GELU_MODE at
    trace time)."""
    if GELU_MODE == "fastest":
        return _gelu_fastest(x_bf)
    return _gelu_fast(x_bf) if GELU_MODE == "fast" else _gelu_bf16(x_bf)


def set_numeric_profile(profile: str) -> None:
    """Select the fused kernels' numeric mode set (trace-time globals).

    * ``"bitexact"`` (module default): replicate the XLA model path's bf16
      rounding chain op for op — used by parity tests and any path that
      claims byte-identical transcripts against the torch reference without
      further validation.
    * ``"serving"``: the fastest TRANSCRIPT-GATED mode set — A&S 7.1.27
      GELU, Newton-refined reciprocal, softmax normalizer from the probs@V
      matmul's ones column. Every mode in this set produced byte-identical
      transcripts to the bitexact chain on the trained WER-parity
      checkpoint (validation/fused_mode_check.py; results in
      validation/fused_mode_report.json) — re-run that gate when adding a
      mode here.
    """
    global GELU_MODE, RECIP_MODE, SOFTMAX_Z_MODE, SOFTMAX_M_MODE
    if profile == "bitexact":
        GELU_MODE, RECIP_MODE = "bitexact", "newton"
        SOFTMAX_Z_MODE, SOFTMAX_M_MODE = "vpu", "rowmax"
    elif profile == "serving":
        GELU_MODE, RECIP_MODE = "fastest", "newton"
        SOFTMAX_Z_MODE, SOFTMAX_M_MODE = "mxu", "rowmax"
    else:
        raise ValueError(f"unknown numeric profile: {profile!r}")


ACT_F32 = {
    "gelu": _gelu_exact,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "identity": lambda x: x,
}

# Activations on bf16 values, replicating the XLA model path's per-op bf16
# rounding (models/ebranchformer.py ACT applies to bf16 arrays). "gelu" has
# a dedicated exact chain (dispatched through GELU_MODE); the rest compute
# in f32 and round once, which matches XLA's upcast-compute-downcast
# lowering for transcendentals.
ACT_BF16 = {
    "gelu": gelu_bf16,
    **{
        k: (lambda f: (lambda x: f(x.astype(jnp.float32)).astype(jnp.bfloat16)))(f)
        for k, f in ACT_F32.items()
        if k != "gelu"
    },
}

# Fixed input order for the kernel (after the scalar-prefetch lengths).
WEIGHT_FIELDS = (
    # macaron FF1
    "ff1_ln_g", "ff1_ln_b", "ff1_wi", "ff1_bi", "ff1_wo", "ff1_bo",
    # attention
    "attn_ln_g", "attn_ln_b",
    "wq",                    # 1/sqrt(dh) pre-folded
    "bq_u", "bq_v",          # (bq + bias_u) * inv, (bq + bias_v) * inv
    "wk", "bk", "wv", "bv",
    "wo", "bo",
    "wp_e", "wp_o",          # (H, dh, D/2) low-rank pos projection, de-interleaved
    "rot_cos", "rot_sin",    # (T, D/2) rotation tables
    "k_std",                 # (T, D) ascending sinusoid table [sin | cos]
    # cgMLP
    "cg_ln_g", "cg_ln_b", "cg_w1", "cg_b1",
    "csgu_ln_g", "csgu_ln_b", "csgu_dw", "csgu_dw_b",
    "csgu_lin_w", "csgu_lin_b",   # optional linear-after-conv ((1,1) dummies when off)
    "cg_w2", "cg_b2",
    # merge
    "merge_dw", "merge_dw_b", "merge_w", "merge_b",
    # macaron FF2 + final LN
    "ff2_ln_g", "ff2_ln_b", "ff2_wi", "ff2_bi", "ff2_wo", "ff2_bo",
    "final_ln_g", "final_ln_b",
)


@dataclasses.dataclass(frozen=True)
class LayerStatic:
    """Static shape/config parameters baked into the kernel."""

    T: int
    D: int
    H: int
    I: int            # intermediate_size
    k_csgu: int
    k_merge: int
    eps: float
    hidden_act: str
    csgu_act: str
    has_csgu_linear: bool = False
    bb: int = 4       # batches per program
    t_valid: int = 0  # pre-padding frame count (0 => T); rows >= t_valid are
                      # masked out of the depthwise convs so T-padding cannot
                      # leak into valid frames (the XLA path never sees them)
    # Benchmark-only ablation: comma-joined subset of
    # {"no_attn", "no_dwconv", "no_gelu", "no_ff"} — skips that piece to
    # attribute kernel time. NEVER set in the product path.
    ablate: str = ""

    @property
    def dh(self) -> int:
        return self.D // self.H


def _ln(h, g_ref, b_ref, eps):
    """LayerNorm over lanes, replicating flax's exact rounding chain:
    fp32 fast variance (E[x^2] - mu^2, clipped at 0), mul = rsqrt(var+eps)
    * scale, y = (x-mu)*mul + bias, one bf16 rounding at the end. One fewer
    data pass than the two-pass variance, and bit-matches nn.LayerNorm."""
    hf = h.astype(jnp.float32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(hf * hf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    mul = jax.lax.rsqrt(var + eps) * g_ref[0].astype(jnp.float32)
    y = (hf - mu) * mul + b_ref[0].astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def _mm(a, w_ref, b_ref=None):
    """bf16 x bf16 -> f32-accumulated matmul (+bias), bf16 out."""
    out = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    if b_ref is not None:
        out = out + b_ref[0].astype(jnp.float32)
    return out.astype(jnp.bfloat16)


PAD_ALLOC = 16  # max supported conv half-width ((K-1)/2 <= PAD_ALLOC)


def _dwconv(x_bTC, w_ref, b_ref, K, t_mask):
    """Depthwise conv along T: zero-padded fp32 VALUE + K static slice-FMAs.

    x_bTC: (bb, T, C) bf16. t_mask: (1, T, 1) bool (valid-frame rows) or
    None. Returns (bb, T, C) float32 (accumulator — caller applies
    act/gate). The padded buffer is an SSA value, not a scratch ref, so
    independent kernel stages never serialize through a shared buffer —
    the VLIW scheduler is free to overlap this (pure-VPU) conv with MXU
    matmuls from other stages.
    """
    bb, T, C = x_bTC.shape
    P = (K - 1) // 2
    xf = x_bTC.astype(jnp.float32)
    if t_mask is not None:
        xf = jnp.where(t_mask, xf, 0.0)
    xp = jnp.pad(xf, ((0, 0), (P, P), (0, 0)))
    acc = jnp.broadcast_to(b_ref[0, :].astype(jnp.float32), (bb, T, C))
    for j in range(K):
        acc = acc + xp[:, j : j + T, :] * w_ref[j, :].astype(jnp.float32)
    return acc


def _layer_kernel(*refs, st: LayerStatic):
    w = dict(zip(("x", "lens_vec") + WEIGHT_FIELDS, refs[:-1]))
    o_ref = refs[-1]
    T, D, H, dh, I, bb = st.T, st.D, st.H, st.dh, st.I, st.bb
    half = D // 2
    eps = st.eps
    N = bb * T
    ab = set(st.ablate.split(",")) if st.ablate else set()
    act = (
        (lambda z: z) if "no_gelu" in ab else ACT_BF16[st.hidden_act]
    )
    # cgMLP channel_proj1 is ALWAYS exact GELU (reference ConvolutionalGatingMLP
    # hardcodes nn.GELU; models/ebranchformer.py:361 matches) — cfg.hidden_act
    # applies only to the macaron FFs.
    cg_act = (lambda z: z) if "no_gelu" in ab else ACT_BF16["gelu"]

    t_valid = st.t_valid or T
    if t_valid < T:
        t_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1) < t_valid
        )
    else:
        t_mask = None

    x = w["x"][...].reshape(N, D)  # (bb*T, D) bf16

    # ---- macaron FF1: x += 0.5 * FF(LN(x))
    if "no_ff" not in ab:
        h = _ln(x, w["ff1_ln_g"], w["ff1_ln_b"], eps)
        h = _mm(h, w["ff1_wi"], w["ff1_bi"])
        h = act(h)
        h = _mm(h, w["ff1_wo"], w["ff1_bo"])
        x = (x.astype(jnp.float32) + 0.5 * h.astype(jnp.float32)).astype(jnp.bfloat16)

    residual = x

    # ---- attention branch (global; factored relative positions)
    g = _ln(x, w["attn_ln_g"], w["attn_ln_b"], eps)
    qq = jnp.dot(g, w["wq"][...], preferred_element_type=jnp.float32)  # (N, D)
    q_u = (qq + w["bq_u"][0].astype(jnp.float32)).astype(jnp.bfloat16)
    q_v = (qq + w["bq_v"][0].astype(jnp.float32)).astype(jnp.bfloat16)
    k = _mm(g, w["wk"], w["bk"])
    v = _mm(g, w["wv"], w["bv"])

    rot_cos = w["rot_cos"][...].astype(jnp.float32)  # (T, half)
    rot_sin = w["rot_sin"][...].astype(jnp.float32)
    cos_n = jnp.concatenate([rot_cos] * bb, axis=0)  # (N, half)
    sin_n = jnp.concatenate([rot_sin] * bb, axis=0)
    k_std = w["k_std"][...]                          # (T, D) bf16

    # key-column mask from per-batch lengths, as an ADDITIVE (bb, 1, T)
    # vector: `scores + mvec` broadcasts in one VPU pass, vs the (bb, T, T)
    # iota-compare + select (3 full-size passes) of a boolean mask. Masked
    # lanes land at ~NEG_INF (ac+bd is O(1e2)), which exp2 underflows to
    # exactly 0 after the rowmax subtraction — same probs as the select.
    col1 = jax.lax.broadcasted_iota(jnp.int32, (bb, 1, T), 2)
    mvec = jnp.where(col1 < w["lens_vec"][...], 0.0, NEG_INF)  # (bb, 1, T)

    # Per-head chains are fully independent SSA values. The output
    # projection has two formulations (ATTN_OUT_MODE, trace-time knob):
    #   * "distributed": g_out = sum_h out_h @ Wo[lanes_h] — no shared
    #     assembly buffer, so head h+1's VPU work (q_rot build, softmax)
    #     can overlap head h's MXU dots in the VLIW schedule; but each dot
    #     is K=dh (<128), so the MXU runs at <=dh/128 pipeline utilization.
    #   * "assembled": concatenate the per-head outputs and run ONE
    #     (N, D) @ (D, D) dot — full-K MXU efficiency, one assembly copy.
    out_heads = []
    g_acc = jnp.broadcast_to(
        w["bo"][0].astype(jnp.float32), (N, D)
    )
    for hd in range(H) if "no_attn" not in ab else ():
        lanes = slice(hd * dh, (hd + 1) * dh)
        # low-rank positional coefficients: qv_h @ Wp_h^T, K = dh
        qvh = q_v[:, lanes]                           # (N, dh)
        ce = jnp.dot(
            qvh, w["wp_e"][hd], preferred_element_type=jnp.float32
        )                                             # (N, D/2)
        co = jnp.dot(
            qvh, w["wp_o"][hd], preferred_element_type=jnp.float32
        )
        q_rot = jnp.concatenate(
            [cos_n * ce + sin_n * co, cos_n * co - sin_n * ce], axis=-1
        ).astype(jnp.bfloat16)                        # (N, D)
        # bd for all rows in ONE matmul; ac/pv batched over bb
        bd = jax.lax.dot_general(
            q_rot, k_std, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bb, T, T)
        qh = q_u[:, lanes].reshape(bb, T, dh)
        kh = k[:, lanes].reshape(bb, T, dh)
        vh = v[:, lanes].reshape(bb, T, dh)
        ac = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # (bb, T, T)
        # 1/sqrt(dh) pre-folded into wq/bq_u and the qv path (fold_layer_weights)
        # log2(e) is pre-folded into wq/bq_u/bq_v (fold_layer_weights), so
        # softmax runs on exp2 directly — saves the per-element x*log2(e)
        # multiply that exp lowers to on the VPU. exp2(s*log2e) == exp(s).
        scores = ac + bd + mvec
        if SOFTMAX_M_MODE == "skip":
            # static bound instead of the per-row max: no reduction pass,
            # no pipeline barrier. softmax(s - C) == softmax(s - m) exactly
            # when neither overflows; the z guard below absorbs full-row
            # underflow (NEG_INF-masked rows stay exact zeros either way).
            e = jnp.exp2(scores - SOFTMAX_M_BOUND)
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp2(scores - m)
        if SOFTMAX_Z_MODE == "mxu":
            vh1 = jnp.concatenate(
                [vh, jnp.ones((bb, T, 1), jnp.bfloat16)], axis=-1
            )
            out_z = jax.lax.dot_general(
                e.astype(jnp.bfloat16), vh1, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                          # (bb, T, dh+1)
            z = out_z[..., dh:]
            if SOFTMAX_M_MODE == "skip":
                z = jnp.maximum(z, 1e-30)
            out_h = out_z[..., :dh] * (1.0 / z)
        else:
            z = jnp.sum(e, axis=-1, keepdims=True)     # (bb, T, 1) f32
            if SOFTMAX_M_MODE == "skip":
                z = jnp.maximum(z, 1e-30)
            out_h = jax.lax.dot_general(
                e.astype(jnp.bfloat16), vh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                          # (bb, T, dh)
            out_h = out_h * (1.0 / z)                  # normalize post-PV
        if ATTN_OUT_MODE == "assembled":
            out_heads.append(out_h.astype(jnp.bfloat16).reshape(N, dh))
        else:
            g_acc = g_acc + jnp.dot(
                out_h.astype(jnp.bfloat16).reshape(N, dh),
                w["wo"][hd * dh : (hd + 1) * dh, :],
                preferred_element_type=jnp.float32,
            )

    if out_heads:
        g_acc = g_acc + jnp.dot(
            jnp.concatenate(out_heads, axis=-1), w["wo"][...],
            preferred_element_type=jnp.float32,
        )
    g_out = g_acc.astype(jnp.bfloat16)                # (N, D)

    # ---- cgMLP branch
    l = _ln(x, w["cg_ln_g"], w["cg_ln_b"], eps)
    l = _mm(l, w["cg_w1"], w["cg_b1"])                # (N, I)
    l = cg_act(l)
    C = I // 2
    x_r = l[:, :C]
    x_g = _ln(l[:, C:], w["csgu_ln_g"], w["csgu_ln_b"], eps)

    if "no_dwconv" in ab:
        gated = x_r * x_g
    else:
        acc = _dwconv(
            x_g.reshape(bb, T, C), w["csgu_dw"], w["csgu_dw_b"],
            st.k_csgu, t_mask,
        )
        if st.has_csgu_linear:
            t = _mm(acc.astype(jnp.bfloat16).reshape(N, C),
                    w["csgu_lin_w"], w["csgu_lin_b"])
            gate = ACT_F32[st.csgu_act](t.astype(jnp.float32)).astype(jnp.bfloat16)
        else:
            gate = ACT_F32[st.csgu_act](acc).astype(jnp.bfloat16).reshape(N, C)
        gated = x_r * gate
    l = _mm(gated, w["cg_w2"], w["cg_b2"])            # (N, D)

    # ---- merge: concat + depthwise fusion + projection, residual
    merged = jnp.concatenate([g_out, l], axis=-1)     # (N, 2D)
    if "no_dwconv" not in ab:
        fused = _dwconv(
            merged.reshape(bb, T, 2 * D), w["merge_dw"], w["merge_dw_b"],
            st.k_merge, t_mask,
        ).astype(jnp.bfloat16).reshape(N, 2 * D)
        merged = merged + fused
    x = (
        residual.astype(jnp.float32)
        + _mm(merged, w["merge_w"], w["merge_b"]).astype(jnp.float32)
    ).astype(jnp.bfloat16)

    # ---- macaron FF2
    if "no_ff" not in ab:
        h = _ln(x, w["ff2_ln_g"], w["ff2_ln_b"], eps)
        h = _mm(h, w["ff2_wi"], w["ff2_bi"])
        h = act(h)
        h = _mm(h, w["ff2_wo"], w["ff2_bo"])
        x = (x.astype(jnp.float32) + 0.5 * h.astype(jnp.float32)).astype(jnp.bfloat16)

    # ---- final LN
    o_ref[...] = _ln(x, w["final_ln_g"], w["final_ln_b"], eps).reshape(bb, T, D)


def fold_layer_weights(
    lp: Dict[str, Any], cfg, T: int
) -> Dict[str, jnp.ndarray]:
    """Extract + pre-fold one Flax layer's params into kernel inputs.

    lp = params["wav2vec2"]["encoder"][f"layers_{i}"] (EBranchformerEncoderLayer).

    Folds applied (all exact, in fp32 before the bf16 cast):
      * 1/sqrt(dh) attention scale into W_q and both bias vectors — the
        positional (bd) term inherits it through q_v, the content (ac) term
        through q_u, so `scores = ac + bd` needs no multiply in-kernel.
      * bias_u / bias_v added into the query bias (two bias vectors, one
        shared W_q matmul in-kernel).
      * The per-head positional projection is kept LOW-RANK: Wp_h^T as
        (dh, D), de-interleaved into even/odd sinusoid channels so the
        kernel needs no strided lane slicing.
    """
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    dh = D // H
    bf = jnp.bfloat16
    # 1/sqrt(dh) attention scale AND log2(e) (the kernel's softmax uses
    # exp2 — see _layer_kernel) folded into the query path.
    inv = np.float32(np.log2(np.e) / np.sqrt(dh))

    def ln2(p):
        # f32, matching flax (LayerNorm params are f32; bf16 storage would
        # add a rounding the XLA path doesn't have)
        return (
            jnp.asarray(p["scale"], jnp.float32).reshape(1, -1),
            jnp.asarray(p["bias"], jnp.float32).reshape(1, -1),
        )

    att = lp["self_attn"]
    wq = (jnp.asarray(att["linear_q"]["kernel"], jnp.float32) * inv).astype(bf)
    bq = jnp.asarray(att["linear_q"]["bias"], jnp.float32)
    wp = jnp.asarray(att["linear_pos"]["kernel"], jnp.float32)  # (Din=D, D)
    bias_u = jnp.asarray(att["pos_bias_u"], jnp.float32)  # (H, dh)
    bias_v = jnp.asarray(att["pos_bias_v"], jnp.float32)

    # Per-head positional projection transposed: wp_t[h] = Wp_r[:, h, :]^T
    # (dh, D) — maps the head's q_v to PE-coefficient space. Split into the
    # even (sin) and odd (cos) sinusoid channels so the kernel needs no
    # strided lane slicing.
    wp_r = wp.reshape(D, H, dh)                            # (Dout, H, dh)
    wp_t = jnp.transpose(wp_r, (1, 2, 0))                  # (H, dh, Dout)
    # NEGATED sin-half: the kernel computes q_rot = [cos*ce + sin*co,
    # cos*co - sin*ce]; with ce built from -wp_e this equals the PE[t-s]
    # (reference-convention) factorization [sin*co - cos*ce', sin*ce' +
    # cos*co] for ce' = qv @ wp_e — see models/ebranchformer.py factored
    # path. Keeps the kernel body unchanged.
    wp_e = (-wp_t[:, :, 0::2]).astype(bf)                  # (H, dh, D/2)
    wp_o = wp_t[:, :, 1::2].astype(bf)

    half = np.exp(np.arange(0, D, 2, dtype=np.float64) * -(np.log(10000.0) / D))
    angles = np.arange(T, dtype=np.float64)[:, None] * half
    rot_cos = jnp.asarray(np.cos(angles), bf)
    rot_sin = jnp.asarray(np.sin(angles), bf)
    k_std = jnp.concatenate([rot_sin, rot_cos], axis=-1)   # (T, D) bf16

    bq_u = ((bq.reshape(H, dh) + bias_u).reshape(1, D) * inv).astype(jnp.float32)
    bq_v = ((bq.reshape(H, dh) + bias_v).reshape(1, D) * inv).astype(jnp.float32)

    ff1g, ff1b = ln2(lp["ff1_layer_norm"])
    attg, attb = ln2(lp["self_attn_layer_norm"])
    cgg, cgb = ln2(lp["cgMLP_layer_norm"])
    csgug, csgub = ln2(lp["cgMLP"]["csgu"]["norm"])
    ff2g, ff2b = ln2(lp["ff2_layer_norm"])
    fing, finb = ln2(lp["final_layer_norm"])

    # flax depthwise conv kernels: (K, 1, C) for feature_group_count=C
    csgu_dw = jnp.asarray(lp["cgMLP"]["csgu"]["conv"]["kernel"], bf)
    csgu_dw = csgu_dw.reshape(csgu_dw.shape[0], -1)       # (K, C)
    merge_dw = jnp.asarray(lp["depthwise_conv_fusion"]["kernel"], bf)
    merge_dw = merge_dw.reshape(merge_dw.shape[0], -1)    # (K, 2D)

    def dense(p, name):
        return (
            jnp.asarray(p[name]["kernel"], bf),
            jnp.asarray(p[name]["bias"], bf).reshape(1, -1),
        )

    ff1_wi, ff1_bi = dense(lp["ff1"], "intermediate_dense")
    ff1_wo, ff1_bo = dense(lp["ff1"], "output_dense")
    ff2_wi, ff2_bi = dense(lp["ff2"], "intermediate_dense")
    ff2_wo, ff2_bo = dense(lp["ff2"], "output_dense")
    wk, bk = dense(att, "linear_k")
    wv, bv = dense(att, "linear_v")
    wo, bo = dense(att, "linear_out")
    cg_w1, cg_b1 = dense(lp["cgMLP"], "channel_proj1")
    cg_w2, cg_b2 = dense(lp["cgMLP"], "channel_proj2")
    merge_w, merge_b = dense(lp, "merge_proj")

    return dict(
        ff1_ln_g=ff1g, ff1_ln_b=ff1b, ff1_wi=ff1_wi, ff1_bi=ff1_bi,
        ff1_wo=ff1_wo, ff1_bo=ff1_bo,
        attn_ln_g=attg, attn_ln_b=attb,
        wq=wq, bq_u=bq_u, bq_v=bq_v, wk=wk, bk=bk, wv=wv, bv=bv, wo=wo, bo=bo,
        wp_e=wp_e, wp_o=wp_o,
        rot_cos=rot_cos, rot_sin=rot_sin, k_std=k_std,
        cg_ln_g=cgg, cg_ln_b=cgb, cg_w1=cg_w1, cg_b1=cg_b1,
        csgu_ln_g=csgug, csgu_ln_b=csgub,
        csgu_lin_w=(
            jnp.asarray(lp["cgMLP"]["csgu"]["linear"]["kernel"], bf)
            if "linear" in lp["cgMLP"]["csgu"] else jnp.zeros((1, 1), bf)
        ),
        csgu_lin_b=(
            jnp.asarray(lp["cgMLP"]["csgu"]["linear"]["bias"], bf).reshape(1, -1)
            if "linear" in lp["cgMLP"]["csgu"] else jnp.zeros((1, 1), bf)
        ),
        csgu_dw=csgu_dw,
        csgu_dw_b=jnp.asarray(
            lp["cgMLP"]["csgu"]["conv"]["bias"], jnp.float32
        ).reshape(1, -1),
        cg_w2=cg_w2, cg_b2=cg_b2,
        merge_dw=merge_dw,
        merge_dw_b=jnp.asarray(
            lp["depthwise_conv_fusion"]["bias"], jnp.float32
        ).reshape(1, -1),
        merge_w=merge_w, merge_b=merge_b,
        ff2_ln_g=ff2g, ff2_ln_b=ff2b, ff2_wi=ff2_wi, ff2_bi=ff2_bi,
        ff2_wo=ff2_wo, ff2_bo=ff2_bo,
        final_ln_g=fing, final_ln_b=finb,
    )


def ebranchformer_layer(
    x: jnp.ndarray,           # (B, T, D) bf16
    lengths: jnp.ndarray,     # (B,) int32 valid frame counts
    weights: Dict[str, jnp.ndarray],
    cfg,
    *,
    bb: int = 4,
    t_valid: int = 0,
    interpret: bool = False,
    ablate: str = "",
) -> jnp.ndarray:
    """Run one fused E-Branchformer layer. T must be a multiple of 8 and B a
    multiple of bb. ``t_valid`` is the pre-padding frame count (0 => T)."""
    B, T, D = x.shape
    if B % bb:
        raise ValueError(f"B={B} must be a multiple of bb={bb}")
    if T % 8:
        raise ValueError(f"T={T} must be a multiple of 8")
    if max(cfg.csgu_kernel_size, cfg.merge_conv_kernel) > 2 * PAD_ALLOC + 1:
        raise ValueError("conv kernel exceeds pad allocation")
    st = LayerStatic(
        T=T, D=D, H=cfg.num_attention_heads, I=cfg.intermediate_size,
        k_csgu=cfg.csgu_kernel_size, k_merge=cfg.merge_conv_kernel,
        eps=cfg.layer_norm_eps, hidden_act=cfg.hidden_act,
        csgu_act=cfg.csgu_activation, bb=bb, ablate=ablate,
        has_csgu_linear=cfg.csgu_use_linear_after_conv,
        t_valid=t_valid,
    )

    w_list = [weights[f] for f in WEIGHT_FIELDS]

    def const_map(ndim):
        return lambda i: (0,) * ndim

    in_specs = [
        pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(wa.shape, const_map(wa.ndim), memory_space=pltpu.VMEM)
        for wa in w_list
    ]

    return pl.pallas_call(
        partial(_layer_kernel, st=st),
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            # The whole layer's live intermediates exceed the conservative
            # 16 MB default scoped-vmem limit; v5e has far more physical VMEM.
            vmem_limit_bytes=(64 if bb <= 8 else 116) * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16),
        lengths.astype(jnp.int32).reshape(-1, 1, 1),
        *w_list,
    )
