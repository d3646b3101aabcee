"""Training-step throughput bench on the real chip: bench-size CTC model.

Measures sustained train-step time (fwd + bwd + optimizer + anomaly guard,
bf16 compute / f32 params — the reference's ``--bf16`` AMP semantics,
recipes_v0.0.1/decred/commonvoice/train_DeCRED_small.sh:119) for the
base-size E-Branchformer CTC model on B x 10 s utterances, and derives
audio-sec/sec and model FLOPs utilization from the compiled step's XLA cost
analysis. K steps run inside ONE dispatch (lax.scan) to amortize the ~29 ms
axon tunnel RTT, same methodology as bench.py.

  python validation/train_bench.py --batch 64 --steps 12
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=12, help="scan steps per dispatch")
    ap.add_argument("--label-len", type=int, default=40)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-time-warp", action="store_true",
                    help="disable SpecAugment time warp (default ON — the "
                         "trainer default and the reference's ESPnet SpecAug "
                         "both apply it; measurements with it off are lighter "
                         "than the product step and labeled as such)")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed dispatches; min is reported (bench.py style)")
    ap.add_argument("--relpos", default=None,
                    help="attention relpos_impl override (gather|shift|factored)")
    ap.add_argument("--remat", action="store_true",
                    help="enable per-layer gradient checkpointing")
    ap.add_argument("--dwconv", default=None,
                    help="dwconv_impl override (conv|slice): slice evaluates "
                         "the depthwise convs as k static-slice FMAs whose "
                         "autodiff avoids the grouped transposed-conv "
                         "backward lowering")
    ap.add_argument("--layers", type=int, default=12,
                    help="override layer count (CPU smoke tests)")
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (env vars are unreliable "
                         "under the axon sitecustomize — jax.config must be "
                         "set before any device query)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig
    from huggingface_asr_tpu.parallel.mesh import MeshConfig, make_mesh
    from huggingface_asr_tpu.training.loop import CTCTrainer, TrainerConfig
    from huggingface_asr_tpu.training.optim import OptimizerConfig

    extra = {}
    if args.relpos:
        extra["relpos_impl"] = args.relpos
    if args.dwconv:
        extra["dwconv_impl"] = args.dwconv
    config = EBranchformerConfig(
        hidden_size=args.hidden, num_hidden_layers=args.layers,
        num_attention_heads=8, intermediate_size=4 * args.hidden,
        conv_dim=(args.hidden, args.hidden), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
        remat=args.remat, **extra,
    )
    n_dev = jax.device_count()
    mesh = make_mesh(MeshConfig(data=n_dev))
    trainer = CTCTrainer(
        EBranchformerForCTC(
            config, dtype=jnp.float32 if args.fp32 else jnp.bfloat16
        ),
        TrainerConfig(
            optimizer=OptimizerConfig(
                learning_rate=2e-3, warmup_steps=1000, total_steps=100000
            ),
            spec_augment=SpecAugmentConfig(
                apply_time_warp=not args.no_time_warp
            ),
        ),
        mesh=mesh,
    )

    B, sec = args.batch, args.seconds
    T = int(sec * 100) - 2  # 10 ms mel frames, CustomFE length convention
    rng = np.random.default_rng(0)
    batch = {
        "input_features": jnp.asarray(
            rng.standard_normal((B, T, 80)).astype(np.float32)
        ),
        "input_lengths": jnp.full((B,), T, jnp.int32),
        "labels": jnp.asarray(
            rng.integers(1, config.vocab_size, (B, args.label_len)), jnp.int32
        ),
        "label_lengths": jnp.full((B,), args.label_len, jnp.int32),
    }
    state = trainer.init_state(batch)

    # K steps in one compiled program: replicate BaseTrainer's train_step
    # body (loss_and_metrics + apply_gradients_guarded — the same pure
    # functions the product step jits) inside a lax.scan.
    def one_step(state, _):
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        aug_rng, dropout_rng = jax.random.split(step_rng)

        def loss_fn(params):
            return trainer.loss_and_metrics(
                params, batch, aug_rng, dropout_rng, state.step
            )

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state, gnorm, _ok = state.apply_gradients_guarded(
            grads=grads,
            max_grad_norm_guard=trainer.config.max_grad_norm_guard,
        )
        return new_state, (loss, gnorm)

    @jax.jit
    def run(state):
        return jax.lax.scan(one_step, state, None, length=args.steps)

    lowered = run.lower(state)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops_total = float(cost.get("flops", 0.0)) if cost else 0.0

    state2, (losses, _) = run(state)
    jax.block_until_ready(losses)  # warmup + compile

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state2, (losses, _) = run(state2)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    step_s = dt / args.steps
    audio_rtfx = B * sec / step_s
    flops_per_step = flops_total / args.steps
    # Analytic model FLOPs: 2.033 GF per audio-second forward (XLA cost
    # analysis of the inference graph, BASELINE.md) x 3 for fwd+bwd — the
    # standard backward ~= 2x forward rule. The axon client's cost_analysis
    # on the training graph under-reports (~11x below analytic), so MFU is
    # derived from the analytic number; the raw cost-analysis figure is
    # still printed for reference. All per-chip numbers divide the global
    # batch by the device count; peak is bf16 197 TF (v5e) or 98.5 TF fp32.
    flops_analytic = 3.0 * 2.033e9 * B * sec
    peak_flops = 98.5e12 if args.fp32 else 197e12
    mfu = flops_analytic / n_dev / step_s / peak_flops
    result = {
        "metric": "ebranchformer_ctc_train_step",
        "batch": B,
        "devices": n_dev,
        "step_ms": round(step_s * 1e3, 2),
        "train_rtfx_per_chip": round(audio_rtfx / n_dev, 1),
        "examples_per_sec": round(B / step_s, 1),
        "flops_per_step_cost_analysis": flops_per_step,
        "mfu_analytic": round(mfu, 4),
        "time_warp": not args.no_time_warp,
        "losses_finite": bool(np.isfinite(np.asarray(losses)).all()),
    }
    # vs_train_baseline: 8-chip pod rate over the reference's measured
    # train-step A100 op-stream roofline anchor (validation/roofline_train.py
    # -> validation/train_baseline.json), same convention as bench.py.
    anchor_path = os.path.join(REPO, "validation", "train_baseline.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        a100_rtfx = anchor.get("a100_train_rtfx")
        if a100_rtfx:
            result["a100_train_anchor_rtfx"] = a100_rtfx
            result["vs_train_baseline"] = round(
                8.0 * (audio_rtfx / n_dev) / a100_rtfx, 3
            )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
