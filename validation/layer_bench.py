"""Fused-encoder (Pallas mega-kernel) vs XLA path on real TPU: parity + speed.

Bench-size model (hidden 256, 12 layers, H=8, vocab 500), B=128, 10 s
utterances. Prints JSON lines: logit parity on valid frames, then wall time
for the XLA pipeline and the fused pipeline (mel front end + encoder + greedy
in one jit for both).
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
    ap.add_argument("--bb", type=int, default=4)
    ap.add_argument("--ablate", default="")
    ap.add_argument("--fe-precision", default="highest")
    ap.add_argument("--frontend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--parity-batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused
    from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd

    config = EBranchformerConfig(
        hidden_size=256, num_hidden_layers=12, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
    )
    model = EBranchformerForCTC(config, dtype=jnp.bfloat16)
    fe_cfg = LogMelConfig(matmul_precision=args.fe_precision)
    if args.frontend == "pallas":
        from huggingface_asr_tpu.ops.pallas_features import PallasLogMelFrontEnd

        frontend = PallasLogMelFrontEnd(fe_cfg)
    else:
        frontend = LogMelFrontEnd(fe_cfg)

    B, sec = args.batch, args.seconds
    S = int(16000 * sec)
    rng = np.random.default_rng(0)
    waves = [
        jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
        for _ in range(args.iters)
    ]
    wl = jnp.full((B,), S, jnp.int32)

    f0, fl0 = frontend(waves[0][:1], wl[:1])
    params = model.init(jax.random.key(0), f0, fl0)["params"]

    @jax.jit
    def xla_pipe(params, wav):
        feats, flens = frontend(wav, wl)
        out = model.apply({"params": params}, feats, flens, deterministic=True)
        toks, n = ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)
        return jnp.sum(n) + jnp.sum(toks[:, 0])

    @jax.jit
    def fused_pipe(params, wav):
        feats, flens = frontend(wav, wl)
        out = ctc_infer_fused(params, config, feats, flens, bb=args.bb,
                              ablate=args.ablate)
        toks, n = ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)
        return jnp.sum(n) + jnp.sum(toks[:, 0])

    # ---- parity on a small batch (logits over valid frames)
    pb = 0 if args.skip_parity else args.parity_batch
    if pb:
        feats_p, flens_p = frontend(waves[0][:pb], wl[:pb])
        ref = model.apply({"params": params}, feats_p, flens_p, deterministic=True)
        got = ctc_infer_fused(params, config, feats_p, flens_p, bb=min(args.bb, pb))
        r = np.asarray(ref.logits, np.float32)
        g = np.asarray(got.logits, np.float32)
        valid = (
            np.arange(r.shape[1])[None, :] < np.asarray(ref.logit_lengths)[:, None]
        )
        diff = np.abs(g - r)[valid]
        ref_toks, ref_n = ctc_greedy_decode(ref.logits, ref.logit_lengths, blank_id=-1)
        got_toks, got_n = ctc_greedy_decode(got.logits, got.logit_lengths, blank_id=-1)
        same = bool(
            np.array_equal(np.asarray(ref_n), np.asarray(got_n))
            and np.array_equal(np.asarray(ref_toks), np.asarray(got_toks))
        )
        print(json.dumps({
            "check": "parity",
            "max_abs_diff": float(diff.max()),
            "logit_scale": float(np.abs(r[valid]).max()),
            "greedy_tokens_identical": same,
        }), flush=True)

    def timed(fn):
        fn(params, waves[0]).block_until_ready()
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(params, waves[i])
        out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters

    audio = B * sec
    if not args.skip_xla:
        dt = timed(xla_pipe)
        print(json.dumps({"variant": "xla", "ms": round(dt * 1e3, 2),
                          "rtfx": round(audio / dt, 1)}), flush=True)
    dt = timed(fused_pipe)
    print(json.dumps({"variant": "fused", "ms": round(dt * 1e3, 2),
                      "rtfx": round(audio / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
