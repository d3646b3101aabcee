"""Front-end-only microbench: XLA vs Pallas log-mel at each matmul precision.

Times just `frontend(waveforms, lengths)` on the bench workload (B=128, 10 s)
and reports parity of the Pallas kernel against the XLA-highest reference.
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

import jax.numpy as jnp  # noqa: E402  (after path setup)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default="xla:highest,xla:high,pallas:highest,pallas:high")
    ap.add_argument("--rows-layout", action="store_true",
                    help="feed Pallas variants the (B, rows, hop) hop-row "
                         "layout (host-side free reshape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd

    B, sec = args.batch, args.seconds
    S = int(16000 * sec)
    rng = np.random.default_rng(0)
    waves = [
        jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
        for _ in range(args.iters)
    ]
    wl = jnp.full((B,), S, jnp.int32)

    ref_feats = None
    for spec in args.variants.split(","):
        kind, prec = spec.split(":")
        cfg = LogMelConfig(matmul_precision=prec)
        rows_in = False
        if kind == "pallas":
            from huggingface_asr_tpu.ops.pallas_features import PallasLogMelFrontEnd

            fe = PallasLogMelFrontEnd(cfg)
            rows_in = args.rows_layout
        else:
            fe = LogMelFrontEnd(cfg)

        if rows_in:
            rows, hop = fe.rows_alloc(S), cfg.hop_length
            use_waves = [
                jnp.pad(w, ((0, 0), (0, rows * hop - S))).reshape(B, rows, hop)
                for w in waves
            ]
            fe_kw = {"num_samples": S}
        else:
            use_waves = waves
            fe_kw = {}

        @jax.jit
        def run(wav):
            f, fl = fe(wav, wl, **fe_kw)
            return f, fl

        # scalar-fetch variant for timing: on the axon transport,
        # block_until_ready does not reliably wait; a value fetch does
        @jax.jit
        def run_s(wav):
            f, fl = fe(wav, wl, **fe_kw)
            return jnp.sum(f)

        try:
            f0, _ = run(use_waves[0])
            f0.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": spec, "error": repr(e)[:500]}), flush=True)
            continue
        if spec == "xla:highest":
            ref_feats = np.asarray(f0, np.float32)
        float(run_s(use_waves[0]))
        t0 = time.perf_counter()
        outs = [run_s(w) for w in use_waves]
        for o in outs:
            float(o)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"variant": spec, "ms": round(dt * 1e3, 2),
               "rtfx": round(B * sec / dt, 1)}
        if ref_feats is not None and spec != "xla:highest":
            d = np.abs(np.asarray(f0, np.float32) - ref_feats)
            rec["max_abs_diff_vs_xla_highest"] = float(d.max())
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
