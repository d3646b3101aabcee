"""Subsampler kernel iteration harness: time conv_subsample_fused on chip.

Fast compiles (no encoder) — use for kernel optimization loops and ablation
attribution, like kernel_iter.py for the layer kernel.

  python validation/sub_iter.py --ablate ";no_gelu;no_conv2"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--T_in", type=int, default=1000)   # mel frames (10 s)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ablate", default="",
                    help="';'-separated variants, each a comma-set of "
                         "{no_gelu,no_conv2}; empty entry = full kernel")
    ap.add_argument("--recip", default="off",
                    help="';'-separated RECIP_MODE variants (off/newton/approx)")
    ap.add_argument("--gelu", default="bitexact",
                    help="';'-separated GELU_MODE variants (bitexact/fast)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.ops import pallas_layer

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.ops.pallas_subsample import conv_subsample_fused

    cfg = EBranchformerConfig(
        hidden_size=256, num_hidden_layers=1, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
    )
    B, T_in = args.batch, args.T_in
    model = EBranchformerForCTC(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(rng.standard_normal((1, T_in, 80)), jnp.float32)
    params = model.init(
        jax.random.key(0), feats0, jnp.full((1,), T_in, jnp.int32)
    )["params"]

    T2 = ((T_in - 1) // 2 + 1 - 1) // 2 + 1
    T2p = -(-T2 // 8) * 8
    feats = jnp.asarray(
        rng.standard_normal((B, T_in, 80)).astype(np.float32)
    )
    jax.block_until_ready(feats)

    variants = [
        (a.strip(), r.strip(), g.strip())
        for g in args.gelu.split(";")
        for r in args.recip.split(";")
        for a in args.ablate.split(";")
    ]
    for variant, recip, gelu in variants:
        pallas_layer.RECIP_MODE = recip
        pallas_layer.GELU_MODE = gelu

        @jax.jit
        def fn(feats):
            def body(c, _):
                # carry-dependent input defeats loop-invariant hoisting
                h = conv_subsample_fused(
                    params["wav2vec2"], cfg, feats + c * 1e-20, T2_pad=T2p,
                    ablate=variant,
                )
                return c + jnp.sum(h.astype(jnp.float32)), 0

            s, _ = jax.lax.scan(body, 0.0, None, length=args.iters)
            return s

        float(fn(feats))  # compile
        t0 = time.perf_counter()
        float(fn(feats))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "variant": variant or "full", "recip": recip, "gelu": gelu,
            "ms": round(dt * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
