"""Stage-by-stage attribution of the bench pipeline (fused path) on real TPU.

Times cumulative pipeline prefixes — mel FE | +conv/proj | +N fused layers |
full (+heads+greedy) — each as one jit program with distinct device inputs,
enqueue-all-then-fetch (same methodology as bench.py, robust to the ~30 ms
axon dispatch RTT). The deltas between stages attribute the batch time.

Run: python validation/bench_attrib.py [--stages mel,conv,enc12,full]
     [--bb 8] [--iters 5]
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
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bb", type=int, default=8)
    ap.add_argument("--stages", default="mel,conv,enc2,enc12,full")
    ap.add_argument("--lazy-inputs", action="store_true")
    ap.add_argument("--scan", action="store_true",
                    help="run each stage over all iters inside ONE dispatch "
                         "(lax.scan over stacked batches, like bench.py) so "
                         "the ~29 ms tunnel RTT is paid once, not per iter — "
                         "deltas are then pure device time")
    ap.add_argument("--serving", action="store_true",
                    help="use bench.py's serving numeric profile (A&S GELU, "
                         "MXU softmax normalizer, bf16 single-pass DFT + "
                         "in-kernel CMVN) so stage deltas attribute the "
                         "OFFICIAL bench number, not the bitexact chain")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused
    from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
    from huggingface_asr_tpu.ops.features import LogMelConfig
    from huggingface_asr_tpu.ops.pallas_features import PallasLogMelFrontEnd

    cfg_kw = dict(
        hidden_size=256, num_hidden_layers=12, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
    )
    B, sec = args.batch, args.seconds
    S = int(16000 * sec)
    if args.serving:
        from huggingface_asr_tpu.ops.pallas_layer import set_numeric_profile

        set_numeric_profile("serving")
        frontend = PallasLogMelFrontEnd(
            LogMelConfig(matmul_precision="bf16"), fused_cmvn_bf16=True
        )
    else:
        frontend = PallasLogMelFrontEnd(LogMelConfig())
    rows, hop = frontend.rows_alloc(S), 160
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(args.iters):
        w = np.zeros((B, rows * hop), np.float32)
        w[:, :S] = rng.standard_normal((B, S)).astype(np.float32) * 0.1
        batches.append(jnp.asarray(w.reshape(B, rows, hop)))
    lens = jnp.full((B,), S, jnp.int32)
    if not args.lazy_inputs:
        # Stage inputs on device before timing (transfers are lazy on this
        # transport); --lazy-inputs keeps the old behavior so the transfer
        # floor itself can be measured via the "base" stage.
        jax.block_until_ready(batches)

    def make(stage):
        n_layers = cfg_kw["num_hidden_layers"]
        if stage.startswith("enc"):
            n_layers = int(stage[3:])
        cfg = EBranchformerConfig(**{**cfg_kw, "num_hidden_layers": n_layers})
        model = EBranchformerForCTC(cfg, dtype=jnp.bfloat16)
        f0, fl0 = frontend(batches[0][:1], lens[:1], num_samples=S)
        params = model.init(jax.random.key(0), f0, fl0)["params"]

        @jax.jit
        def fn(wav):
            if stage == "base":
                # trivial consumer of the input: isolates the host->device
                # transfer / transport floor from real front-end compute
                return jnp.sum(wav[:, :, :1])
            feats, feat_lens = frontend(wav, lens, num_samples=S)
            if stage == "mel":
                return jnp.sum(feats)
            if stage == "sub":
                from huggingface_asr_tpu.ops.pallas_subsample import (
                    conv_subsample_fused,
                )
                T2 = feats.shape[1] // 4
                T2p = -(-T2 // 8) * 8
                h = conv_subsample_fused(
                    params["wav2vec2"], cfg, feats, T2_pad=T2p
                )
                return jnp.sum(h.astype(jnp.float32))
            if stage in ("conv", "conv1", "conv2"):
                from huggingface_asr_tpu.models.ebranchformer import (
                    Conv2dFeatureExtractor, FeatureProjection,
                )
                enc_p = params["wav2vec2"]
                if stage in ("conv1", "conv2"):
                    # single conv stage in isolation (same weights)
                    import flax.linen as nn
                    cp = enc_p["feature_extractor"]
                    x = feats[..., None].astype(jnp.bfloat16)
                    x = nn.Conv(256, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)], dtype=jnp.bfloat16,
                                name=None).apply(
                        {"params": cp["conv_0"]}, x)
                    x = jax.nn.gelu(x, approximate=False)
                    if stage == "conv2":
                        x = nn.Conv(256, (3, 3), strides=(2, 2),
                                    padding=[(1, 1), (1, 1)],
                                    dtype=jnp.bfloat16, name=None).apply(
                            {"params": cp["conv_1"]}, x)
                        x = jax.nn.gelu(x, approximate=False)
                    return jnp.sum(x)
                ex = Conv2dFeatureExtractor(cfg, jnp.bfloat16, name=None).apply(
                    {"params": enc_p["feature_extractor"]}, feats
                )
                h, _ = FeatureProjection(cfg, jnp.bfloat16, name=None).apply(
                    {"params": enc_p["feature_projection"]}, ex, True
                )
                return jnp.sum(h)
            out = ctc_infer_fused(params, cfg, feats, feat_lens, bb=args.bb)
            if stage == "full":
                toks, n = ctc_greedy_decode(
                    out.logits, out.logit_lengths, blank_id=-1
                )
                return jnp.sum(n) + jnp.sum(toks[:, 0])
            return jnp.sum(out.logits)

        return fn

    audio_sec = B * sec
    stacked = jnp.stack(batches) if args.scan else None
    if args.scan:
        jax.block_until_ready(stacked)
    prev = None
    for stage in args.stages.split(","):
        stage = stage.strip()
        fn = make(stage)
        if args.scan:
            inner = fn

            @jax.jit
            def fn(ws):
                def body(c, w):
                    return c, inner(w)
                _, outs = jax.lax.scan(body, 0, ws)
                return jnp.sum(outs)

            float(fn(stacked))  # compile
            t0 = time.perf_counter()
            float(fn(stacked))
            dt = (time.perf_counter() - t0) / args.iters
        else:
            float(fn(batches[0]))  # compile
            t0 = time.perf_counter()
            outs = [fn(w) for w in batches]
            for o in outs:
                float(o)
            dt = (time.perf_counter() - t0) / args.iters
        rec = {
            "stage": stage, "ms": round(dt * 1e3, 2),
            "rtfx": round(audio_sec / dt, 1),
        }
        if prev is not None:
            rec["delta_ms"] = round((dt - prev) * 1e3, 2)
        prev = dt
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
