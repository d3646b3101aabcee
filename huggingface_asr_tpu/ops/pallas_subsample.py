"""Fused conv-subsampler Pallas TPU kernel: mel → encoder hidden states.

Replaces the XLA ``Conv2dFeatureExtractor`` + ``FeatureProjection`` pair on
the inference path. The XLA lowering of the first conv (C_in=1, 3x3,
stride 2) runs at ~0.4% MFU on TPU (measured 10.2 ms of a 56 ms B=128x10 s
batch for 3 GF of work — validation/bench_attrib.py stages conv1/conv2),
and the conv1→conv2 handoff round-trips a 1.3 GB activation through HBM.
This kernel computes the whole subsampler per batch item in VMEM:

  conv1(1→C, 3x3, s2, p1) → GELU → conv2(C→C, 3x3, s2, p1) → GELU
  → flatten (channel-major) → Dense out (F2·C → D) → LayerNorm → Dense proj

Design (all matmuls MXU-shaped, no strided vector access anywhere):
  * Time stride 4 (two stride-2 convs) is pre-packed on the host/XLA side:
    the mel image (T_in, 80) is viewed as x4 = (T2, 320) — FOUR mel rows
    per sublane row — plus a shifted tail view (T2, 80) carrying mel row
    4·t2-1. Both are free XLA reshapes/slices of the padded mel buffer.
  * conv1 becomes, per output frequency group f' (40 groups), TWO matmuls:
        y1p[f'] = x4 @ B[f'] + x_tail_prev @ C[f']          # (T2, 2C)
    where B[f'] (320, 2C) holds the 3x3 taps for BOTH conv1 output
    parities (lanes [0:C] = even frame 2·t2, lanes [C:2C] = odd frame
    2·t2+1) and C[f'] (80, C) the one tap that crosses the 4-row boundary.
    The parity packing means conv2's stride-2 time access is an ALIGNED
    LANE-HALF SLICE of y1p — no stride-2 sublane reads exist in the kernel.
  * conv2 is 9 exact-FLOP matmuls per output group f2:
        y2[f2] = sum_{kt,kf} y1p[2f2+kf-1][rows±1, parity-half(kt)] @ W2[kt,kf]
    over a zero-padded group axis (f2 edges) and a zero top row (t2 edge).
  * The flatten + Dense out (F2·C → D) contraction is distributed into the
    f2 loop: out_acc += y2[f2] @ Wout[f2], with Wout's rows re-gathered
    host-side into the reference's channel-major flatten order (c·F2+f2).
  * Rounding points match the XLA path bit-for-bit at bf16: every matmul
    accumulates fp32 and rounds to bf16 BEFORE the (bf16) bias add, GELU is
    evaluated in fp32 on the bf16-rounded input (rational erf, |err|<=3e-7,
    below bf16 resolution), LayerNorm statistics are fp32.

Supported configs (gate in ``fits_subsample_kernel``): two conv layers,
kernel 3x3, stride 2x2, padding 1x1, GELU activation, no context gating,
non-causal. Everything else falls back to the XLA modules.

Reference behavior spec: /root/reference/src/models/encoders/e_branchformer.py
(Wav2Vec2EBranchformerConfig conv stack) and extractors.py:133-162 (2-D conv
front end); the torch reference flattens (B, T', C, F') channel-major, which
``fold_subsample_weights`` reproduces when regathering Wout.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from huggingface_asr_tpu.ops.pallas_layer import _erfc_rational

_SQRT_HALF_BF16 = 0.70703125  # float(jnp.bfloat16(np.sqrt(0.5)))


def _gelu_xla_bf16(x_bf: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact replica of ``jax.nn.gelu(x, approximate=False)`` on bf16:
    XLA evaluates ``0.5 * x * erfc(-x * bf16(sqrt(1/2)))`` with EVERY
    elementwise op rounded to bf16 (erfc itself is computed in f32 and
    rounded once). Reproducing the rounding chain makes the kernel agree
    with the XLA path to the last bf16 ulp (modulo erfc tail rounding,
    |err| <= 3e-7 in f32)."""
    f32, bf = jnp.float32, jnp.bfloat16
    xf = x_bf.astype(f32)
    u = (xf * (-_SQRT_HALF_BF16)).astype(bf).astype(f32)
    e = _erfc_rational(u).astype(bf).astype(f32)
    half = (xf * 0.5).astype(bf).astype(f32)
    return (half * e).astype(bf)


def fits_subsample_kernel(cfg) -> bool:
    return (
        tuple(cfg.conv_dim) == (256, 256)
        and tuple(cfg.conv_kernel) == (3, 3)
        and tuple(cfg.conv_stride) == (2, 2)
        and tuple(cfg.conv_padding) == (1, 1)
        and cfg.feat_extract_activation == "gelu"
        and cfg.context_awareness_type in (None, "none")
        and not cfg.is_causal
        and cfg.num_fbanks == 80
    )


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def fold_subsample_weights(enc_p: Dict[str, Any], cfg) -> Dict[str, jnp.ndarray]:
    """Fold the conv/out/LN/proj params into kernel operand matrices.

    enc_p = params["wav2vec2"] (needs feature_extractor + feature_projection).
    """
    fe = enc_p["feature_extractor"]
    C = cfg.conv_dim[0]
    F = cfg.num_fbanks          # 80 mel bins
    F1 = F // 2                 # 40 conv1 output bins
    F2 = F1 // 2                # 20 conv2 output bins
    w1 = _np(fe["conv_0"]["kernel"])   # (3, 3, 1, C) = (kt, kf, 1, C)
    b1 = _np(fe["conv_0"]["bias"])     # (C,)
    w2 = _np(fe["conv_1"]["kernel"])   # (3, 3, C, C)
    b2 = _np(fe["conv_1"]["bias"])
    wout = _np(fe["out"]["kernel"])    # (C*F2, D) flatten channel-major: row c*F2+f2
    bout = _np(fe["out"]["bias"])
    fp = enc_p["feature_projection"]
    ln_g = _np(fp["layer_norm"]["scale"])
    ln_b = _np(fp["layer_norm"]["bias"])
    wproj = _np(fp["projection"]["kernel"])
    bproj = _np(fp["projection"]["bias"])
    D = wout.shape[1]

    # conv1 operators. y1[t1=2*t2+p, f', c] = sum_{kt,kf} mel[2*t1+kt-1,
    # 2*f'+kf-1] * w1[kt,kf,0,c]. Mel row 2*t1+kt-1 = 4*t2 + (2p+kt-1):
    # local rows 0..3 live in x4[t2] (lanes r*80+f), row -1 (p=0, kt=0) in
    # x_tail_prev[t2] (mel row 4*t2-1).
    B_op = np.zeros((F1, 4 * F, 2 * C), np.float32)
    C_op = np.zeros((F1, F, C), np.float32)
    for fp_ in range(F1):
        for p in (0, 1):
            for kt in range(3):
                r = 2 * p + kt - 1              # local mel row in x4[t2]
                for kf in range(3):
                    f = 2 * fp_ + kf - 1
                    if not (0 <= f < F):
                        continue                # conv f-padding: zero
                    if r < 0:
                        C_op[fp_, f, :] = w1[kt, kf, 0, :]
                    else:
                        B_op[fp_, r * F + f, p * C : (p + 1) * C] = w1[kt, kf, 0, :]

    # conv2 taps, ordered [kt*3+kf]: each (C, C).
    W2 = np.transpose(w2, (0, 1, 2, 3)).reshape(9, C, C)

    # out-dense rows regathered per f2 group: Wout_f2[c, :] = wout[c*F2+f2].
    Wout = np.stack([wout[np.arange(C) * F2 + f2] for f2 in range(F2)])

    bf = jnp.bfloat16
    return dict(
        sub_B=jnp.asarray(B_op, bf),            # (F1, 320, 2C)
        sub_C=jnp.asarray(C_op, bf),            # (F1, 80, C)
        sub_b1=jnp.asarray(np.tile(b1, 2), bf).reshape(1, -1),  # (1, 2C)
        sub_W2=jnp.asarray(W2, bf),             # (9, C, C)
        sub_b2=jnp.asarray(b2, bf).reshape(1, -1),
        sub_Wout=jnp.asarray(Wout, bf),         # (F2, C, D)
        sub_bout=jnp.asarray(bout, bf).reshape(1, -1),
        sub_ln_g=jnp.asarray(ln_g, jnp.float32).reshape(1, -1),
        sub_ln_b=jnp.asarray(ln_b, jnp.float32).reshape(1, -1),
        sub_Wproj=jnp.asarray(wproj, bf),       # (D, D)
        sub_bproj=jnp.asarray(bproj, bf).reshape(1, -1),
    )


def _subsample_kernel(
    x4_ref, tail_ref, B_ref, C_ref, b1_ref, W2_ref, b2_ref,
    Wout_ref, bout_ref, lng_ref, lnb_ref, Wproj_ref, bproj_ref,
    o_ref, y1p_ref, acc_ref,
    *, T2: int, C: int, F1: int, F2: int, n_even: int, n_odd: int, eps: float,
):
    f32, bf = jnp.float32, jnp.bfloat16
    x4 = x4_ref[0].astype(bf)                   # (T2, 320)
    tail = tail_ref[0].astype(bf)               # (T2, 80)

    # valid-row masks for conv1 output parities (rows >= T1_valid must be
    # EXACT ZERO — the XLA path never computes them, and conv2's p=1 padding
    # reads zeros there). lanes [0:C] hold even frames (valid t2 < n_even),
    # lanes [C:2C] odd frames (valid t2 < n_odd).
    row = jax.lax.broadcasted_iota(jnp.int32, (T2, 2 * C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T2, 2 * C), 1)
    bound = jnp.where(lane < C, n_even, n_odd)  # int select (bool-of-bool
    valid = row < bound                         # select is unsupported)

    # ---- conv1 (+bias, GELU) per frequency group, parity-packed output.
    # y1p layout: (F1+1, 1+T2, 2C); group 0 and row 0 are zero pads for
    # conv2's f2/t2 edges.
    y1p_ref[0, :, :] = jnp.zeros((1 + T2, 2 * C), bf)

    def c1_body(g, carry):
        acc = jnp.dot(x4, B_ref[g], preferred_element_type=f32)   # (T2, 2C)
        c_term = jnp.dot(tail, C_ref[g], preferred_element_type=f32)  # (T2, C)
        # C-term contributes only to the even-parity half (lanes [0:C]).
        acc = acc + jnp.concatenate(
            [c_term, jnp.zeros_like(c_term)], axis=1
        )
        # XLA rounding order: fp32 matmul acc -> bf16, +bias (bf16 add),
        # GELU on the bf16 value in fp32, -> bf16.
        h = acc.astype(bf) + b1_ref[0][None, :]     # b1 pre-tiled to (2C,)
        h = _gelu_xla_bf16(h)
        h = jnp.where(valid, h, jnp.zeros_like(h))
        y1p_ref[g + 1, 1:, :] = h
        y1p_ref[g + 1, 0:1, :] = jnp.zeros((1, 2 * C), bf)
        return carry

    jax.lax.fori_loop(0, F1, c1_body, 0, unroll=False)

    # ---- conv2 (+bias, GELU) + distributed out-dense contraction.
    # Term (kt, kf) for output group f2 reads y1p group 2*f2+kf (with the
    # +1 zero-pad offset this is index 2*f2+kf), rows [0:T2] for kt=0
    # (frame 2*t2-1 = odd half of t2-1) and rows [1:1+T2] for kt=1,2,
    # lane half by parity: kt=0 -> odd, kt=1 -> even, kt=2 -> odd.
    def c2_body(f2, carry):
        acc = jnp.zeros((T2, C), f32)
        for kt in range(3):
            lo = C if kt != 1 else 0
            r0 = 0 if kt == 0 else 1
            for kf in range(3):
                g = 2 * f2 + kf
                tap = y1p_ref[g, r0 : r0 + T2, lo : lo + C]
                acc = acc + jnp.dot(
                    tap, W2_ref[3 * kt + kf], preferred_element_type=f32
                )
        y2 = acc.astype(bf) + b2_ref[0][None, :]
        y2 = _gelu_xla_bf16(y2)
        acc_ref[...] = acc_ref[...] + jnp.dot(
            y2, Wout_ref[f2], preferred_element_type=f32
        )
        return carry

    acc_ref[...] = jnp.zeros(acc_ref.shape, f32)
    jax.lax.fori_loop(0, F2, c2_body, 0, unroll=False)

    # ---- out bias, LayerNorm (fp32 stats), projection.
    # LayerNorm, replicating flax's rounding chain exactly: f32 stats with
    # use_fast_variance (E[x^2]-mu^2, clipped at 0), mul = rsqrt(var+eps) *
    # scale (f32 params), y = (x-mu)*mul + bias.
    h = acc_ref[...].astype(bf) + bout_ref[0][None, :]
    hf = h.astype(f32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(hf * hf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    mul = jax.lax.rsqrt(var + eps) * lng_ref[0][None, :]
    h = ((hf - mu) * mul + lnb_ref[0][None, :]).astype(bf)
    out = jnp.dot(h, Wproj_ref[...], preferred_element_type=f32)
    o_ref[0, :, :] = out.astype(bf) + bproj_ref[0][None, :]


def conv_subsample_fused(
    enc_p: Dict[str, Any],
    cfg,
    features: jnp.ndarray,      # (B, T_in, 80) fp32 log-mel (CMVN applied)
    *,
    T2_pad: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused subsampler. Returns (B, T2_pad, hidden) bf16; rows
    >= the XLA output length T2 are unspecified (callers mask by length).
    ``T2_pad`` must be a multiple of 8 and >= the XLA conv output length."""
    if not fits_subsample_kernel(cfg):
        raise ValueError("config outside the fused subsampler's support")
    B, T_in, F = features.shape
    C = cfg.conv_dim[0]
    D = cfg.hidden_size
    F1, F2 = F // 2, F // 4
    T1_valid = (T_in + 2 * 1 - 3) // 2 + 1
    T2_xla = (T1_valid + 2 * 1 - 3) // 2 + 1
    if T2_pad % 8 or T2_pad < T2_xla:
        raise ValueError(f"T2_pad={T2_pad} must be 8-aligned and >= {T2_xla}")
    n_even = -(-T1_valid // 2)          # t2 rows with a valid even frame
    n_odd = T1_valid // 2               # ... valid odd frame

    rows_need = 4 * T2_pad
    mel = features
    if rows_need > T_in:
        mel = jnp.pad(mel, ((0, 0), (0, rows_need - T_in), (0, 0)))
    else:
        mel = mel[:, :rows_need]
    x4 = mel.reshape(B, T2_pad, 4 * F)
    tail = mel[:, 3::4]                                  # (B, T2_pad, 80) = row 4*t2+3
    tail_prev = jnp.pad(tail, ((0, 0), (1, 0), (0, 0)))[:, :-1]  # row 4*t2-1

    w = fold_subsample_weights(enc_p, cfg)
    names = ("sub_B", "sub_C", "sub_b1", "sub_W2", "sub_b2",
             "sub_Wout", "sub_bout", "sub_ln_g", "sub_ln_b",
             "sub_Wproj", "sub_bproj")
    w_list = [w[n] for n in names]

    in_specs = [
        pl.BlockSpec((1, T2_pad, 4 * F), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T2_pad, F), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(a.shape, (lambda nd: (lambda b: (0,) * nd))(a.ndim),
                     memory_space=pltpu.VMEM)
        for a in w_list
    ]

    return pl.pallas_call(
        partial(
            _subsample_kernel, T2=T2_pad, C=C, F1=F1, F2=F2,
            n_even=n_even, n_odd=n_odd, eps=cfg.layer_norm_eps,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T2_pad, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T2_pad, D), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((F1 + 1, 1 + T2_pad, 2 * C), jnp.bfloat16),
            pltpu.VMEM((T2_pad, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x4, tail_prev, *w_list)
