"""Fused relative-position self-attention — Pallas TPU kernel.

The E-Branchformer's Transformer-XL attention is memory-bound under XLA: the
(B, H, T, T) fp32 score tensors (content + positional terms) round-trip HBM
between the QK matmul, bias add, softmax, and PV matmul. This kernel keeps
the ENTIRE per-(batch, head) score matrix in VMEM — audio encoder sequences
(T ≤ ~1k frames after subsampling) make that feasible without online-softmax
tiling — computing

    scores = (q_u @ k^T + shift(q_v @ pos^T)) / sqrt(dh),  masked softmax,  @ v

in one fused pass. The positional "shift" uses the reversed-table trick: with
pos reversed, row t of the band matrix needs the ascending contiguous slice
starting at (T-1-t), extracted with dynamic slices inside the kernel — no
gather, no padded reshape, no HBM copies.

Grid: (B, H) — embarrassingly parallel; per-program VMEM footprint is
O(T·dh + T²) fp32 (≈0.5 MB at T=256, ≈17 MB at T=1024).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e9


def _rel_attn_kernel(len_ref, qu_ref, qv_ref, k_ref, v_ref, posr_ref, o_ref, *, T, dh):
    """One (batch, head) attention. posr = REVERSED pos table padded to (2T, dh)."""
    qu = qu_ref[0, 0]
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    ac = jax.lax.dot_general(
        qu, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, T)

    bd_full = jax.lax.dot_general(
        qv, posr_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, 2T) against the reversed (padded) table

    # Row t of the positional term = bd_full[t, (T-1-t) : (2T-1-t)].
    # Per-row dynamic lane slices don't lower on TPU, so apply the row shift
    # as a BARREL SHIFTER: log2(T) masked circular rolls (no wraparound
    # reaches the first T lanes since shifts are < T).
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, 2 * T), 0)
    shift = (T - 1) - rows  # desired left-shift per row
    band = bd_full
    j = 1
    while j < T:
        # left-shift by j == circular right-shift by 2T - j (roll requires >=0)
        rolled = pltpu.roll(band, 2 * T - j, axis=1)
        bit = (shift & j) != 0
        band = jnp.where(bit, rolled, band)
        j <<= 1

    scores = (ac + band[:, :T]) * (1.0 / np.sqrt(dh).astype(np.float32))

    length = len_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    scores = jnp.where(col < length, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0, 0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def rel_attention(
    q_u: jnp.ndarray,  # (B, T, H, dh) query + pos_bias_u
    q_v: jnp.ndarray,  # (B, T, H, dh) query + pos_bias_v
    k: jnp.ndarray,  # (B, T, H, dh)
    v: jnp.ndarray,  # (B, T, H, dh)
    pos: jnp.ndarray,  # (2T-1, H, dh) projected positional table
    lengths: jnp.ndarray,  # (B,) valid key counts
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, T, H, dh). T should be a multiple of 8 for best tiling."""
    B, T, H, dh = q_u.shape
    # reversed table, padded by one zero row to an even 2T lanes
    pos_rev = jnp.concatenate(
        [pos[::-1], jnp.zeros((1,) + pos.shape[1:], pos.dtype)], axis=0
    ).transpose(1, 0, 2)  # (H, 2T, dh)

    def bh(x):  # (B, T, H, dh) -> (B, H, T, dh)
        return x.transpose(0, 2, 1, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # lengths (B,) land in SMEM, indexed by program_id
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, T, dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, T, dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, T, dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, T, dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 2 * T, dh), lambda b, h, *_: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, T, dh), lambda b, h, *_: (b, h, 0, 0)),
    )
    out = pl.pallas_call(
        partial(_rel_attn_kernel, T=T, dh=dh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, dh), q_u.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), bh(q_u), bh(q_v), bh(k), bh(v), pos_rev)
    return out.transpose(0, 2, 1, 3)


def rel_attention_reference(q_u, q_v, k, v, pos, lengths):
    """XLA reference implementation (same math) for validation."""
    B, T, H, dh = q_u.shape
    ac = jnp.einsum("bthd,bshd->bhts", q_u, k).astype(jnp.float32)
    d_idx = jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + (T - 1)
    pos_g = pos[d_idx]
    bd = jnp.einsum("bthd,tshd->bhts", q_v, pos_g).astype(jnp.float32)
    scores = (ac + bd) / np.sqrt(dh)
    mask = jnp.arange(T)[None, None, None, :] < lengths[:, None, None, None]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)
