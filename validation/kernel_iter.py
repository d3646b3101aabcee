"""Single-layer kernel iteration harness: time ONE fused layer on chip.

Much faster compiles than the full 12-layer pipeline — use for kernel
optimization loops and ablation attribution.

  python validation/kernel_iter.py --bb 8 --ablate no_attn
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
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ablate", default="",
                    help="comma-of-semicolon list: each ';'-separated entry "
                         "is one variant benchmarked in sequence")
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--attn_out", default="distributed",
                    help="';'-separated ATTN_OUT_MODE variants "
                         "(distributed/assembled)")
    ap.add_argument("--bb_sweep", default="",
                    help="';'-separated bb variants (overrides --bb)")
    ap.add_argument("--gelu", default="bitexact",
                    help="';'-separated GELU_MODE variants "
                         "(bitexact/fast/fastest)")
    ap.add_argument("--zmode", default="vpu",
                    help="';'-separated SOFTMAX_Z_MODE variants (vpu/mxu)")
    ap.add_argument("--mmode", default="rowmax",
                    help="';'-separated SOFTMAX_M_MODE variants (rowmax/skip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.ops.pallas_layer import (
        ebranchformer_layer,
        fold_layer_weights,
    )

    config = EBranchformerConfig(
        hidden_size=256, num_hidden_layers=1, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
    )
    B, T = args.batch, args.T
    model = EBranchformerForCTC(config, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 4 * T, 80)), jnp.float32)
    params = model.init(
        jax.random.key(0), feats, jnp.asarray([4 * T], jnp.int32)
    )["params"]
    folded = fold_layer_weights(
        params["wav2vec2"]["encoder"]["layers_0"], config, T
    )
    lens = jnp.full((B,), T, jnp.int32)

    xs = [
        jnp.asarray(
            rng.standard_normal((B, T, 256)).astype(np.float32), jnp.bfloat16
        )
        for _ in range(args.iters)
    ]

    xstack = jnp.stack(xs)  # (iters, B, T, D)

    from huggingface_asr_tpu.ops import pallas_layer

    bbs = [int(b) for b in args.bb_sweep.split(";")] if args.bb_sweep else [args.bb]
    variants = [
        (a, m, bb, g, z, mm)
        for a in args.ablate.split(";")
        for m in args.attn_out.split(";")
        for bb in bbs
        for g in args.gelu.split(";")
        for z in args.zmode.split(";")
        for mm in args.mmode.split(";")
    ]
    for ablate, attn_out, bb, gelu, zmode, mmode in variants:
        pallas_layer.ATTN_OUT_MODE = attn_out
        pallas_layer.GELU_MODE = gelu
        pallas_layer.SOFTMAX_Z_MODE = zmode
        pallas_layer.SOFTMAX_M_MODE = mmode

        # ALL iterations inside ONE compiled program (lax.scan over the
        # stacked inputs, like bench.py): the ~29 ms axon dispatch RTT is
        # paid once, not per iteration — deltas are pure device time.
        # NOTE: fetch the scalar with float() — on the axon transport,
        # block_until_ready on a device array does not reliably wait.
        @partial(jax.jit, static_argnums=(1, 2))
        def run(xst, ab, bb):
            def body(carry, x):
                for _ in range(args.layers):
                    x = ebranchformer_layer(
                        x, lens, folded, config, bb=bb, ablate=ab
                    )
                return carry, jnp.sum(x.astype(jnp.float32))
            _, sums = jax.lax.scan(body, 0.0, xst)
            return jnp.sum(sums)

        float(run(xstack, ablate, bb))
        t0 = time.perf_counter()
        float(run(xstack, ablate, bb))
        dt = (time.perf_counter() - t0) / args.iters / args.layers
        print(json.dumps({
            "ablate": ablate, "attn_out": attn_out, "bb": bb, "gelu": gelu,
            "zmode": zmode, "mmode": mmode,
            "B": B, "T": T, "ms_per_layer": round(dt * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
