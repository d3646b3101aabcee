"""Perf attribution for the bench pipeline on real TPU.

The axon tunnel makes per-op microbenchmarks useless (~30 ms dispatch RTT),
so attribution is by ABLATION of whole compiled pipelines (each timed over
several iterations with distinct device-resident inputs):

  frontend-only | +encoder(L layers) | +greedy | pos-emb type | attention impl
  | with/without cgMLP depthwise | batch sweep

Prints a JSON lines report; run when the tunnel is healthy (each variant
compiles 1-3 min remotely, so keep the variant list short).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timed(fn, args, iters=5):
    import jax

    fn(*args[0]).block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args[i % len(args)])
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--variants", default="frontend,encoder,full,layers6,nopos,batch256")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd

    base = dict(
        hidden_size=256, num_hidden_layers=12, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
    )
    B, S = args.batch, int(16000 * args.seconds)
    rng = np.random.default_rng(0)
    frontend = LogMelFrontEnd(LogMelConfig())

    def make_waves(b):
        return [
            jnp.asarray(rng.standard_normal((b, S)).astype(np.float32) * 0.1)
            for _ in range(args.iters)
        ]

    waves = make_waves(B)
    lens = jnp.full((B,), S, jnp.int32)
    audio_sec = B * args.seconds

    def build(cfg_kw, mode, b=None, waves_=None, lens_=None):
        cfg = EBranchformerConfig(**{**base, **cfg_kw})
        model = EBranchformerForCTC(cfg, dtype=jnp.bfloat16)
        w = waves_ or waves
        l = lens_ if lens_ is not None else lens
        f0, fl0 = frontend(w[0][:1], l[:1])
        params = model.init(jax.random.key(0), f0, fl0)["params"]

        if mode == "frontend":
            @jax.jit
            def fn(wav):
                f, fl = frontend(wav, l)
                return f.sum()
            return fn, [(x,) for x in w]
        if mode == "encoder":
            @jax.jit
            def fn(wav):
                f, fl = frontend(wav, l)
                out = model.apply({"params": params}, f, fl, deterministic=True)
                return out.logits.sum()
            return fn, [(x,) for x in w]
        @jax.jit
        def fn(wav):
            f, fl = frontend(wav, l)
            out = model.apply({"params": params}, f, fl, deterministic=True)
            toks, n = ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)
            return jnp.sum(n) + jnp.sum(toks[:, 0])
        return fn, [(x,) for x in w]

    variants = {
        "frontend": lambda: build({}, "frontend"),
        "encoder": lambda: build({}, "encoder"),
        "full": lambda: build({}, "full"),
        "layers6": lambda: build({"num_hidden_layers": 6}, "encoder"),
        "nopos": lambda: build({"position_embeddings_type": "none"}, "encoder"),
        "rotary": lambda: build({"position_embeddings_type": "rotary"}, "encoder"),
        "nomacaron": lambda: build({"use_macaron_ff": False}, "encoder"),
        "shift": lambda: build({"relpos_impl": "shift"}, "encoder"),
        "shift_full": lambda: build({"relpos_impl": "shift"}, "full"),
        "bf16softmax": lambda: build({"attention_softmax_fp32": False}, "encoder"),
        "shift_bf16sm": lambda: build(
            {"relpos_impl": "shift", "attention_softmax_fp32": False}, "encoder"),
        "csgu7": lambda: build({"csgu_kernel_size": 7, "merge_conv_kernel": 7}, "encoder"),
    }

    for name in args.variants.split(","):
        name = name.strip()
        if name == "batch256":
            w2 = make_waves(256)
            l2 = jnp.full((256,), S, jnp.int32)
            fn, a = build({}, "full", waves_=w2, lens_=l2)
            dt = timed(fn, a, args.iters)
            print(json.dumps({"variant": name, "sec_per_iter": round(dt, 4),
                              "rtfx": round(256 * args.seconds / dt, 1)}))
            continue
        if name not in variants:
            print(json.dumps({"variant": name, "error": "unknown"}))
            continue
        fn, a = variants[name]()
        dt = timed(fn, a, args.iters)
        print(json.dumps({"variant": name, "sec_per_iter": round(dt, 4),
                          "rtfx": round(audio_sec / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
