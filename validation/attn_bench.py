"""Micro-benchmark: rel-pos attention formulations on real TPU.

Compares, at bench shapes (B=128, T=256, D=256, H=8, dh=32), per 12-layer
equivalent wall time:

  gather   — status-quo (T,T,H,dh) gathered-table contraction
  shift    — one (2T-1) MXU matmul + pad/reshape Transformer-XL shift
  factored — EXACT sinusoid-addition factorization: fold linear_pos into a
             per-head (D,D) combined projection of x, rotate by t, then one
             K=256 matmul against the ASCENDING standard table (no gather,
             no shift, no (2T-1) materialization)
  pallas   — fused VMEM-resident kernel (v1, barrel shift)
  nobd     — content-only attention (lower bound: bd term removed)

Each variant runs the FULL attention block (qkv proj, scores, masked softmax,
pv, out proj) 12x sequentially (layer-loop analogue) inside one jit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument(
        "--variants", default="gather,shift,factored,pallas,nobd,sm_bf16"
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, T, D, H = args.batch, args.seqlen, 256, 8
    dh = D // H
    L = args.layers
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.05, dtype)

    # Shared weights (one layer's worth, reused L times — we time compute, not
    # weight loads; weights are tiny vs activations here).
    Wq, Wk, Wv, Wo = (mk(D, D) for _ in range(4))
    Wp = mk(D, D)
    bias_u = mk(H, dh)
    bias_v = mk(H, dh)
    lengths = jnp.full((B,), T, jnp.int32)
    mask_bias = jnp.where(
        jnp.arange(T)[None, :] < lengths[:, None], 0.0, -1e9
    )[:, None, None, :].astype(jnp.float32)

    # Transformer-XL table, positions T-1 .. -(T-1) (matches the model).
    pos_np = np.arange(T - 1, -T, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, D, 2, dtype=np.float64) * -(np.log(10000.0) / D))
    table = np.zeros((2 * T - 1, D))
    table[:, 0::2] = np.sin(pos_np * div)
    table[:, 1::2] = np.cos(pos_np * div)
    pos_table = jnp.asarray(table, dtype)

    # Ascending standard table for the factored path: angle = omega * s.
    s_np = np.arange(T, dtype=np.float64)[:, None]
    k_sin = jnp.asarray(np.sin(s_np * div), dtype)  # (T, D/2)
    k_cos = jnp.asarray(np.cos(s_np * div), dtype)
    t_np = np.arange(T, dtype=np.float64)[:, None]
    rot_cos = jnp.asarray(np.cos(t_np * div), dtype)  # (T, D/2)
    rot_sin = jnp.asarray(np.sin(t_np * div), dtype)

    def qkv(x):
        q = (x @ Wq).reshape(B, T, H, dh)
        k = (x @ Wk).reshape(B, T, H, dh)
        v = (x @ Wv).reshape(B, T, H, dh)
        return q, k, v

    def finish(scores, v, sm_fp32=True):
        if sm_fp32:
            scores = scores.astype(jnp.float32)
        scores = scores + mask_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return out @ Wo

    inv_sqrt = 1.0 / np.sqrt(dh)

    def attn_gather(x):
        q, k, v = qkv(x)
        pos = (pos_table @ Wp).reshape(-1, H, dh)
        ac = jnp.einsum("bthd,bshd->bhts", q + bias_u, k)
        d_idx = jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + (T - 1)
        pos_g = pos[d_idx]
        bd = jnp.einsum("bthd,tshd->bhts", q + bias_v, pos_g)
        return finish((ac + bd) * inv_sqrt, v)

    def _rel_shift(bd_all):
        Bh, Hh, Tt, Ll = bd_all.shape
        rev = bd_all[..., ::-1]
        padded = jnp.pad(rev, ((0, 0), (0, 0), (0, 0), (0, 1)))
        flat = padded.reshape(Bh, Hh, Tt * (Ll + 1))[..., : Tt * Ll]
        return flat.reshape(Bh, Hh, Tt, Ll)[..., Tt - 1 : Ll]

    def attn_shift(x):
        q, k, v = qkv(x)
        pos = (pos_table @ Wp).reshape(-1, H, dh)
        ac = jnp.einsum("bthd,bshd->bhts", q + bias_u, k)
        bd_all = jnp.einsum("bthd,rhd->bhtr", q + bias_v, pos)
        bd = _rel_shift(bd_all)
        return finish((ac + bd) * inv_sqrt, v)

    # Factored: fold Wp into a combined per-head x->D projection.
    Wq_r = Wq.reshape(D, H, dh)
    Wp_r = Wp.reshape(D, H, dh)  # (Din, H, dh)
    C = jnp.einsum("xhd,Dhd->hxD", Wq_r, Wp_r)  # (H, D, Din)
    qb = jnp.einsum("hd,Dhd->hD", bias_v, Wp_r)  # (H, Din)

    def attn_factored(x):
        q = (x @ Wq).reshape(B, T, H, dh)
        k = (x @ Wk).reshape(B, T, H, dh)
        v = (x @ Wv).reshape(B, T, H, dh)
        ac = jnp.einsum("bthd,bshd->bhts", q + bias_u, k)
        qw = jnp.einsum("btx,hxD->bthD", x, C) + qb[None, None]
        qe, qo = qw[..., 0::2], qw[..., 1::2]
        # table rows at index t-s+T-1 hold angle omega*(s-t): rotate query by
        # -omega*t, contract against ascending omega*s table.
        ce, se = rot_cos[None, :, None, :], rot_sin[None, :, None, :]
        re_ = ce * qe + se * qo
        ro = -se * qe + ce * qo
        bd = jnp.einsum("bthi,si->bhts", re_, k_sin) + jnp.einsum(
            "bthi,si->bhts", ro, k_cos
        )
        return finish((ac + bd) * inv_sqrt, v)

    def attn_nobd(x):
        q, k, v = qkv(x)
        ac = jnp.einsum("bthd,bshd->bhts", q + bias_u, k)
        return finish(ac * inv_sqrt, v)

    def attn_sm_bf16(x):
        q, k, v = qkv(x)
        pos = (pos_table @ Wp).reshape(-1, H, dh)
        ac = jnp.einsum("bthd,bshd->bhts", q + bias_u, k)
        d_idx = jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + (T - 1)
        pos_g = pos[d_idx]
        bd = jnp.einsum("bthd,tshd->bhts", q + bias_v, pos_g)
        return finish((ac + bd) * inv_sqrt, v, sm_fp32=False)

    def attn_pallas(x):
        from huggingface_asr_tpu.ops.pallas_attention import rel_attention

        q = (x @ Wq).reshape(B, T, H, dh)
        k = (x @ Wk).reshape(B, T, H, dh)
        v = (x @ Wv).reshape(B, T, H, dh)
        pos = (pos_table @ Wp).reshape(-1, H, dh)
        out = rel_attention(q + bias_u, q + bias_v, k, v, pos, lengths)
        return out.reshape(B, T, D) @ Wo

    fns = {
        "gather": attn_gather,
        "shift": attn_shift,
        "factored": attn_factored,
        "pallas": attn_pallas,
        "nobd": attn_nobd,
        "sm_bf16": attn_sm_bf16,
    }

    # Parity check (fp32-ish tolerance on bf16 compute).
    x0 = mk(B, T, D)
    ref = np.asarray(attn_gather(x0), np.float32)
    for name in ("shift", "factored"):
        got = np.asarray(fns[name](x0), np.float32)
        err = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))
        print(json.dumps({"parity": name, "rel_err": round(err, 5)}), flush=True)

    xs = [mk(B, T, D) for _ in range(args.iters)]

    for name in args.variants.split(","):
        name = name.strip()
        f = fns[name]

        @jax.jit
        def run(x, f=f):
            for _ in range(L):
                x = f(x).astype(dtype)
            return x.sum()

        run(xs[0]).block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = run(xs[i])
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps({"variant": name, "ms_per_12layer": round(dt * 1e3, 2)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
