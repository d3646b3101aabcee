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
  * conv1 is an EXACT-FLOP im2col contraction: the host/XLA side builds a
    16-lane patch tensor patches[(g, t2), tap=(r, kf)] = mel[4·t2 + r - 1,
    2·g + kf - 1] from 15 strided slices of the padded mel buffer (pure
    bandwidth ops), and the kernel computes ONE MXU dot
        y1p = patches @ Wtap                  # (R, 16) @ (16, 2C)
    where Wtap[(r, kf), p·C + c] = w1[r - 2p, kf, c] packs BOTH conv1
    output parities (lanes [0:C] = even frame 2·t2, lanes [C:2C] = odd
    frame 2·t2+1). A dense folded operator here would burn 45x the conv's
    FLOPs ((400 -> 20480) lanes); the im2col form is exact-FLOP.
  * y1 groups are SSA VALUES, not a scratch ref: each group's conv1 dot +
    GELU is traced lazily at its first conv2 use, so the only edges between
    the conv1 chain (VPU-heavy: ~7 ms of GELU per B=128 batch) and the
    conv2 chain (MXU-heavy: ~7 ms of dots) are true data dependencies.
    The Mosaic scheduler can then OVERLAP group 2·f2+3's GELU with output
    group f2's matmuls — a ref-based staging buffer would serialize the two
    phases through write→read ref order. conv2's stride-2 time access is a
    lane-half split of the group value; the kt=0 (frame 2·t2-1) tap is a
    one-row shifted copy made once per group.
  * conv2 is 9 exact-FLOP matmuls per output group f2:
        y2[f2] = sum_{kt,kf} y1[group 2f2+kf-1][rows(kt), parity(kt)] @ W2[kt,kf]
    with out-of-range groups (f2 edges) skipped outright — no zero-padding
    FLOPs.
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

from huggingface_asr_tpu.ops.pallas_layer import gelu_bf16 as _gelu_xla_bf16

# _gelu_xla_bf16 dispatches on pallas_layer.GELU_MODE: "bitexact" replicates
# jax.nn.gelu(approximate=False)'s bf16 rounding chain op for op; "fast"
# computes the same erfc-based GELU in f32 with one final rounding
# (<= 1-2 bf16 ulp difference, ~35% fewer VPU ops).


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


def fold_subsample_weights(enc_p: Dict[str, Any], cfg) -> Dict[str, jnp.ndarray]:
    """Fold the conv/out/LN/proj params into kernel operand matrices.

    enc_p = params["wav2vec2"] (needs feature_extractor + feature_projection).
    Trace-safe (pure jnp): under jit the folds are constant-folded into the
    program once; eagerly they run on device.
    """
    fe = enc_p["feature_extractor"]
    C = cfg.conv_dim[0]
    F = cfg.num_fbanks          # 80 mel bins
    F1 = F // 2                 # 40 conv1 output bins
    F2 = F1 // 2                # 20 conv2 output bins
    f32 = jnp.float32
    w1 = jnp.asarray(fe["conv_0"]["kernel"], f32)   # (3, 3, 1, C) = (kt, kf, 1, C)
    b1 = jnp.asarray(fe["conv_0"]["bias"], f32)     # (C,)
    w2 = jnp.asarray(fe["conv_1"]["kernel"], f32)   # (3, 3, C, C)
    b2 = jnp.asarray(fe["conv_1"]["bias"], f32)
    wout = jnp.asarray(fe["out"]["kernel"], f32)    # (C*F2, D) flatten channel-major: row c*F2+f2
    bout = jnp.asarray(fe["out"]["bias"], f32)
    fp = enc_p["feature_projection"]
    ln_g = jnp.asarray(fp["layer_norm"]["scale"], f32)
    ln_b = jnp.asarray(fp["layer_norm"]["bias"], f32)
    wproj = jnp.asarray(fp["projection"]["kernel"], f32)
    bproj = jnp.asarray(fp["projection"]["bias"], f32)
    D = wout.shape[1]

    # conv1 tap matrix. y1[t1=2*t2+p, g, c] = sum_{kt,kf} mel[4*t2 +
    # (2p+kt-1), 2*g+kf-1] * w1[kt,kf,0,c]. Patch tap (r, kf) carries mel
    # row 4*t2 + r - 1 (r in 0..4), so parity p contributes via kt = r - 2p:
    # Wtap[(r,kf), p*C+c] = w1[r-2p, kf, 0, c] when 0 <= r-2p < 3.
    Wtap = jnp.zeros((16, 2 * C), f32)          # 15 taps, padded to 16
    for r in range(5):
        for kf in range(3):
            for p in (0, 1):
                kt = r - 2 * p
                if 0 <= kt < 3:
                    Wtap = Wtap.at[r * 3 + kf, p * C : (p + 1) * C].set(
                        w1[kt, kf, 0, :]
                    )

    # conv2 taps, ordered [kt*3+kf]: each (C, C).
    W2 = w2.reshape(9, C, C)

    # out-dense rows regathered per f2 group: Wout_f2[c, :] = wout[c*F2+f2].
    Wout = wout.reshape(C, F2, D).transpose(1, 0, 2)

    bf = jnp.bfloat16
    return dict(
        sub_B=Wtap.astype(bf),                  # (16, 2C)
        sub_b1=jnp.concatenate([b1, b1]).astype(bf).reshape(1, -1),  # (1, 2C)
        sub_W2=W2.astype(bf),                   # (9, C, C)
        sub_b2=b2.astype(bf).reshape(1, -1),
        sub_Wout=Wout.astype(bf),               # (F2, C, D)
        sub_bout=bout.astype(bf).reshape(1, -1),
        sub_ln_g=ln_g.reshape(1, -1),
        sub_ln_b=ln_b.reshape(1, -1),
        sub_Wproj=wproj.astype(bf),             # (D, D)
        sub_bproj=bproj.astype(bf).reshape(1, -1),
    )


def _subsample_kernel(
    patches_ref, B_ref, b1_ref, W2_ref, b2_ref,
    Wout_ref, bout_ref, lng_ref, lnb_ref, Wproj_ref, bproj_ref,
    o_ref,
    *, T2: int, C: int, F1: int, F2: int, n_even: int, n_odd: int, eps: float,
    ablate: str = "",
):
    f32, bf = jnp.float32, jnp.bfloat16
    G = T2                                      # rows per group block
    ab = set(ablate.split(",")) if ablate else set()
    gelu = (lambda z: z) if "no_gelu" in ab else _gelu_xla_bf16

    row = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)

    # ---- conv1 (+bias, GELU): ONE (F1*G, 16) @ (16, 2C) MXU dot for all
    # frequency groups. XLA rounding order: fp32 matmul acc -> bf16, +bias
    # (bf16 add), GELU on the bf16 value (bf16 op chain), -> bf16. Lanes
    # [0:C] of a group hold even frames (valid t2 < n_even), lanes [C:2C]
    # odd (t2 < n_odd); rows the conv never produced must be EXACT ZERO —
    # conv2's time padding reads them.
    # Patch rows are PARITY-MAJOR over frequency groups ([even groups g=2j |
    # odd groups g=2j+1], each in j order — see conv_subsample_fused): the
    # conv2 tap operands below are then contiguous row blocks (one slice),
    # not stride-2 group gathers (which needed a (F2,2,G,C)-reshape copy per
    # tap in the g-ordered layout).
    acc = jnp.dot(patches_ref[0], B_ref[...], preferred_element_type=f32)
    h = acc.astype(bf) + b1_ref[0][None, :]
    h = gelu(h).reshape(F1, G, 2 * C)
    z = jnp.zeros((F1, G, C), bf)
    ev = jnp.where(row < n_even, h[:, :, :C], z)          # (F1, G, C)
    od = jnp.where(row < n_odd, h[:, :, C:], z)
    # odd frame 2*t2-1 (the kt=0 tap): shift one row up WITHIN each group,
    # zero at the t2=0 time edge.
    od_up = jnp.concatenate([z[:, :1], od[:, :-1]], axis=1)

    if "no_conv2" in ab:   # keep all conv1 work live for attribution benches
        out = jnp.sum(
            ev[..., : Wproj_ref.shape[0]].astype(f32), axis=0
        )
    else:
        # ---- conv2 as 9 LARGE matmuls: term (kt, kf) for output group f2
        # reads y1 group g = 2*f2+kf-1 (kt=0 -> odd frame 2*t2-1 (od_up),
        # kt=1 -> even frame 2*t2, kt=2 -> odd frame 2*t2+1). In the
        # parity-major layout the groups needed for fixed kf are one
        # CONTIGUOUS block: kf=1 -> the even block [0, F2), kf=2 -> the odd
        # block [F2, 2*F2), kf=0 -> the odd block shifted one group down
        # (zero slab at the f2=0 edge, adding exact zeros as a skip would).
        # Each tap is ONE (F2*G, C) @ (C, C) dot — same exact FLOPs as the
        # per-f2 formulation, fp32 adds in the same kf-outer/kt-inner order
        # => bit-identical.
        zedge = jnp.zeros((1, G, C), bf)

        def stack(src, kf):
            if kf == 0:
                s = jnp.concatenate([zedge, src[F2 : 2 * F2 - 1]], axis=0)
            elif kf == 1:
                s = src[:F2]
            else:
                s = src[F2:]
            return s.reshape(F2 * G, C)

        acc2 = jnp.zeros((F2 * G, C), f32)
        for kf in range(3):
            for kt, src in ((0, od_up), (1, ev), (2, od)):
                acc2 = acc2 + jnp.dot(
                    stack(src, kf), W2_ref[3 * kt + kf],
                    preferred_element_type=f32,
                )
        y2 = acc2.astype(bf) + b2_ref[0][None, :]
        y2 = gelu(y2).reshape(F2, G, C)

        # ---- distributed out-dense: out = sum_f2 y2[f2] @ Wout[f2] as one
        # batched dot + a slab reduction (same per-element fp32 add order
        # along f2 as the sequential accumulation).
        out3 = jax.lax.dot_general(
            y2, Wout_ref[...], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )                                        # (F2, G, D)
        out = out3[0]
        for f2 in range(1, F2):
            out = out + out3[f2]

    # ---- out bias, LayerNorm (fp32 stats), projection.
    # LayerNorm, replicating flax's rounding chain exactly: f32 stats with
    # use_fast_variance (E[x^2]-mu^2, clipped at 0), mul = rsqrt(var+eps) *
    # scale (f32 params), y = (x-mu)*mul + bias.
    h = out.astype(bf) + bout_ref[0][None, :]
    hf = h.astype(f32)
    mu = jnp.mean(hf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(hf * hf, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    mul = jax.lax.rsqrt(var + eps) * lng_ref[0][None, :]
    h = ((hf - mu) * mul + lnb_ref[0][None, :]).astype(bf)
    proj = jnp.dot(h, Wproj_ref[...], preferred_element_type=f32)
    o_ref[0, :, :] = proj.astype(bf) + bproj_ref[0][None, :]


def conv_subsample_fused(
    enc_p: Dict[str, Any],
    cfg,
    features: jnp.ndarray,      # (B, T_in, 80) fp32 log-mel (CMVN applied)
    *,
    T2_pad: int,
    interpret: bool = False,
    ablate: str = "",
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
    # The kernel consumes bf16 patches; casting the MEL (80 lanes) before the
    # im2col expansion (16 tap lanes per (g, t2)) is bit-identical — each
    # patch element is a single mel value either way — and halves the HBM
    # traffic of every relayout below.
    mel = features.astype(jnp.bfloat16)
    if rows_need > T_in:
        mel = jnp.pad(mel, ((0, 0), (0, rows_need - T_in), (0, 0)))
    else:
        mel = mel[:, :rows_need]
    # im2col patches (bandwidth-only XLA ops: 30 strided slices + stack +
    # transpose). Tap (r, kf) of patch (g, t2) = mel[4*t2 + r - 1,
    # 2*g + kf - 1]; the kernel contracts the 16 tap lanes with Wtap.
    # Frequency groups are laid out PARITY-MAJOR ([even g | odd g]) so the
    # kernel's conv2 tap operands are contiguous row blocks (see
    # _subsample_kernel) — even group j=g/2 reads freq 4j+kf-1, odd group
    # j=(g-1)/2 reads freq 4j+kf+1.
    mel_ext = jnp.pad(mel, ((0, 0), (1, 0), (1, 1)))     # row 4t2+r, freq 2g+kf
    taps = []
    for r in range(5):
        sl = mel_ext[:, r::4][:, :T2_pad]
        for kf in range(3):
            taps.append(jnp.concatenate([
                sl[:, :, kf : kf + 2 * F1 : 4],          # even groups
                sl[:, :, kf + 2 : kf + 2 + 2 * F1 : 4],  # odd groups
            ], axis=-1))
    pat = jnp.stack(taps, axis=-1)                       # (B, T2, F1, 15)
    pat = jnp.pad(pat, ((0, 0), (0, 0), (0, 0), (0, 1)))
    pat = jnp.transpose(pat, (0, 2, 1, 3))               # (B, F1, T2, 16)
    R_pad = F1 * T2_pad                                  # T2_pad is 8-aligned
    patches = pat.reshape(B, R_pad, 16)

    w = fold_subsample_weights(enc_p, cfg)
    names = ("sub_B", "sub_b1", "sub_W2", "sub_b2",
             "sub_Wout", "sub_bout", "sub_ln_g", "sub_ln_b",
             "sub_Wproj", "sub_bproj")
    w_list = [w[n] for n in names]

    in_specs = [
        pl.BlockSpec((1, R_pad, 16), lambda b: (b, 0, 0),
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
            ablate=ablate,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T2_pad, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T2_pad, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(patches, *w_list)
