"""Relative-position attention core for TRAINING — Pallas custom-VJP kernel.

Train-step attribution (validation/train_attrib.py, round 4) measured the XLA
attention branch at ~100 ms of the 240 ms B=64x10 s train step: the
(B, H, T, T) fp32 score/prob tensors round-trip HBM many times across the QK
matmuls, bias add, softmax, dropout mask generation/apply, PV matmul, and
their transposes in the backward. This kernel is the flash-attention
treatment for the FACTORED form of Transformer-XL relative positions (the
exact sinusoid-addition factorization used by the product XLA path,
models/ebranchformer.py — reference math: src/models/encoders/
e_branchformer.py:64-141):

    S = (q_u k^T + q_rot k_std^T) / sqrt(dh)
    P = softmax(mask(S));  Pd = dropout(P);  out = Pd v

where q_rot (B, T, H, D) is the rotary-transformed positional query computed
by cheap XLA matmuls outside the kernel and k_std (T, D) is the constant
ascending sinusoid table (NOT a parameter — no table gradient exists).

Forward and backward each run as ONE kernel per batch row (grid (B,), all
heads in-loop) with every (T, T) intermediate VMEM-resident; the backward
RECOMPUTES S and P from the saved inputs (nothing quadratic ever reaches
HBM), regenerates the dropout mask bit-exactly from the same per-(b, h) PRNG
seed, and emits dq_u, dq_rot, dk, dv. A first shift-form variant (barrel-
shifted (2T-1) table, grid (H, B)) measured SLOWER than XLA-factored
(187.6 vs 160.0 ms full-step) — per-head K=dh matmuls and log2(T) lane
rolls; this factored form replaces every positional op with K=D MXU dots.

Audio-encoder sequences (T <= ~500 after 4x subsampling) make whole-matrix
residency feasible — no online-softmax tiling needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _keep_mask(seed_scalar, h, b, H, T, rate, interpret=False):
    """Deterministic per-(b, h) dropout keep-mask — regenerated identically
    in the backward from the same seed.

    On TPU this uses the per-core hardware PRNG (pltpu.prng_random_bits);
    interpret mode (CPU tests) lacks that primitive, so a counter-based
    integer hash (xorshift-multiply rounds over a 2-D iota) stands in —
    same determinism contract, different stream."""
    thresh = np.uint32(int(rate * float(2**32)))
    # Mix the (seed, block) pair through integer hash rounds so SEQUENTIAL
    # block ids / per-layer seeds land on well-separated PRNG streams —
    # counter-based generators can emit correlated streams for adjacent
    # seeds, and correlated dropout across heads/batch/layers biases
    # training.
    mixed = (jnp.asarray(seed_scalar).astype(jnp.uint32)
             ^ (jnp.asarray(b * H + h).astype(jnp.uint32)
                * np.uint32(0x9E3779B9)))
    for _ in range(2):
        mixed = mixed * np.uint32(0x85EBCA6B)
        mixed = mixed ^ (mixed >> 13)
        mixed = mixed * np.uint32(0xC2B2AE35)
        mixed = mixed ^ (mixed >> 16)
    if interpret:
        ctr = (
            jax.lax.broadcasted_iota(jnp.uint32, (T, T), 0) * np.uint32(T)
            + jax.lax.broadcasted_iota(jnp.uint32, (T, T), 1)
        )
        x = ctr ^ (mixed * np.uint32(0x9E3779B9))
        for _ in range(3):
            x = x * np.uint32(0x85EBCA6B)
            x = x ^ (x >> 13)
            x = x * np.uint32(0xC2B2AE35)
            x = x ^ (x >> 16)
        return x >= thresh
    pltpu.prng_seed(mixed.astype(jnp.int32))
    bits = pltpu.prng_random_bits((T, T))
    return pltpu.bitcast(bits, jnp.uint32) >= thresh


def _head_scores(qu_h, qrot_h, k_h, kstd, length, T, dh):
    """(T, T) fp32 scaled+masked scores for one head."""
    ac = jax.lax.dot_general(
        qu_h, k_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    bd = jax.lax.dot_general(
        qrot_h, kstd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = (ac + bd) * np.float32(1.0 / np.sqrt(dh))
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    return jnp.where(col < length, scores, NEG_INF)


def _softmax(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(len_ref, seed_ref, qu_ref, qrot_ref, k_ref, v_ref, kstd_ref,
                o_ref, *, T, D, H, dh, rate, interpret):
    b = pl.program_id(0)
    kstd = kstd_ref[...]
    length = len_ref[b]
    for h in range(H):
        lanes = slice(h * dh, (h + 1) * dh)
        scores = _head_scores(
            qu_ref[0, :, lanes], qrot_ref[0, :, h * D:(h + 1) * D],
            k_ref[0, :, lanes], kstd, length, T, dh,
        )
        probs = _softmax(scores).astype(o_ref.dtype)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, b, H, T, rate, interpret)
            probs = jnp.where(
                keep,
                probs * np.float32(1.0 / (1.0 - rate)).astype(probs.dtype),
                0,
            )
        o_ref[0, :, lanes] = jax.lax.dot_general(
            probs, v_ref[0, :, lanes], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(len_ref, seed_ref, qu_ref, qrot_ref, k_ref, v_ref, kstd_ref,
                do_ref, dqu_ref, dqrot_ref, dk_ref, dv_ref,
                *, T, D, H, dh, rate, interpret):
    b = pl.program_id(0)
    kstd = kstd_ref[...]
    length = len_ref[b]
    inv_keep = np.float32(1.0 / (1.0 - rate)) if rate > 0.0 else np.float32(1.0)
    for h in range(H):
        lanes = slice(h * dh, (h + 1) * dh)
        dlanes = slice(h * D, (h + 1) * D)
        qu_h = qu_ref[0, :, lanes]
        k_h = k_ref[0, :, lanes]
        v_h = v_ref[0, :, lanes]
        do_h = do_ref[0, :, lanes].astype(jnp.float32)

        # recompute P exactly as the forward did
        scores = _head_scores(
            qu_h, qrot_ref[0, :, dlanes], k_h, kstd, length, T, dh
        )
        p32 = _softmax(scores)
        p_cast = p32.astype(v_h.dtype)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], h, b, H, T, rate, interpret)
            pd = jnp.where(keep, p_cast * inv_keep.astype(p_cast.dtype), 0)
        else:
            pd = p_cast

        dv_ref[0, :, lanes] = jax.lax.dot_general(
            pd.astype(jnp.float32), do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        dpd = jax.lax.dot_general(
            do_h, v_h.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = jnp.where(keep, dpd * inv_keep, 0.0)
        else:
            dp = dpd
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        ds = ds * np.float32(1.0 / np.sqrt(dh))
        ds_cast = ds.astype(qu_h.dtype)

        dqu_ref[0, :, lanes] = jax.lax.dot_general(
            ds_cast, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqu_ref.dtype)
        dk_ref[0, :, lanes] = jax.lax.dot_general(
            ds_cast, qu_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dqrot_ref[0, :, dlanes] = jax.lax.dot_general(
            ds_cast, kstd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqrot_ref.dtype)


def _flat(x):  # (B, T, H, X) -> (B, T, H*X)
    B, T, H, X = x.shape
    return x.reshape(B, T, H * X)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def rel_attention_train(q_u, q_rot, k, v, k_std, lengths, seed,
                        dropout_rate=0.0, interpret=False):
    """Fused factored rel-pos attention core with in-kernel dropout.

    Args:
      q_u: (B, T, H, dh) content query (+pos_bias_u), model dtype.
      q_rot: (B, T, H, D) rotary-transformed positional query (XLA-side).
      k, v: (B, T, H, dh).
      k_std: (T, D) constant ascending sinusoid table (no gradient).
      lengths: (B,) valid key counts.
      seed: int32 scalar ARRAY (traced — a new per-step value does not
        recompile); per-step dropout stream derived from the training RNG.
      dropout_rate: static python float (0 disables the mask entirely).
    Returns (B, T, H, dh) in q_u.dtype.
    """
    out, _ = _fwd_impl(q_u, q_rot, k, v, k_std, lengths, seed, dropout_rate,
                       interpret)
    return out


def _call(kernel, out_shapes, n_out, q_u, q_rot, k, v, k_std, lengths, seed,
          extra_in=(), interpret=False):
    B, T, H, dh = q_u.shape
    D = q_rot.shape[-1]
    out_block_shapes = [(1, T, H * dh), (1, T, H * D), (1, T, H * dh),
                       (1, T, H * dh)]
    if n_out == 1:
        out_specs = pl.BlockSpec((1, T, H * dh), lambda b, *_: (b, 0, 0))
    else:
        out_specs = [
            pl.BlockSpec(shape, lambda b, *_: (b, 0, 0))
            for shape in out_block_shapes[:n_out]
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lengths (B,), seed (1,)
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, H * dh), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, T, H * D), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, T, H * dh), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, T, H * dh), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((T, D), lambda b, *_: (0, 0)),
        ] + [pl.BlockSpec((1, T, H * dh), lambda b, *_: (b, 0, 0))
             for _ in extra_in],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        jnp.atleast_1d(jnp.asarray(seed, jnp.int32)),
        _flat(q_u), _flat(q_rot), _flat(k), _flat(v), k_std,
        *[_flat(x) for x in extra_in],
    )


def _fwd_impl(q_u, q_rot, k, v, k_std, lengths, seed, rate, interpret):
    B, T, H, dh = q_u.shape
    D = q_rot.shape[-1]
    out = _call(
        partial(_fwd_kernel, T=T, D=D, H=H, dh=dh, rate=rate,
                interpret=interpret),
        jax.ShapeDtypeStruct((B, T, H * dh), q_u.dtype),
        1,
        q_u, q_rot, k, v, k_std, lengths, seed,
        interpret=interpret,
    )
    return out.reshape(B, T, H, dh), (q_u, q_rot, k, v, k_std, lengths, seed)


def _fwd_rule(q_u, q_rot, k, v, k_std, lengths, seed, rate, interpret):
    return _fwd_impl(q_u, q_rot, k, v, k_std, lengths, seed, rate, interpret)


def _bwd_rule(rate, interpret, res, g):
    q_u, q_rot, k, v, k_std, lengths, seed = res
    B, T, H, dh = q_u.shape
    D = q_rot.shape[-1]
    dqu, dqrot, dk, dv = _call(
        partial(_bwd_kernel, T=T, D=D, H=H, dh=dh, rate=rate,
                interpret=interpret),
        [
            jax.ShapeDtypeStruct((B, T, H * dh), q_u.dtype),
            jax.ShapeDtypeStruct((B, T, H * D), q_rot.dtype),
            jax.ShapeDtypeStruct((B, T, H * dh), k.dtype),
            jax.ShapeDtypeStruct((B, T, H * dh), v.dtype),
        ],
        4,
        q_u, q_rot, k, v, k_std, lengths, seed,
        extra_in=(g,),
        interpret=interpret,
    )
    return (
        dqu.reshape(B, T, H, dh),
        dqrot.reshape(B, T, H, D),
        dk.reshape(B, T, H, dh),
        dv.reshape(B, T, H, dh),
        jnp.zeros_like(k_std),
        jnp.zeros_like(lengths),
        jnp.zeros_like(seed),
    )


rel_attention_train.defvjp(_fwd_rule, _bwd_rule)
