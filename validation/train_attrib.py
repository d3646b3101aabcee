"""Train-step time attribution on the real chip.

Ablates components of the compiled train step (same body as
validation/train_bench.py / training/loop.py) to locate where the 236 ms
(B=64x10s, round-3 measurement) actually goes:

  full            - the product step (fwd+bwd+AdamW+guard, SpecAug, CTC)
  relpos_factored - full, but attention relpos_impl="factored" (the XLA
                    inference path's winning variant; training default is
                    "gather" which materializes (T,S,H,D) position tables)
  no_ctc          - CTC loss replaced by logits.mean() (isolates the
                    497-step lax.scan CTC recursion)
  no_specaug      - SpecAugment disabled
  fwd_only        - loss value only (no grad, no optimizer)
  grads_only      - value_and_grad but no optimizer/guard update

  python validation/train_attrib.py --batch 64 --steps 6 \
      --modes full,relpos_factored,no_ctc,no_specaug,fwd_only,grads_only
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


def apply_component_patch(mode):
    """Timing probes: stub out one component (fwd+bwd both disappear).
    Returns an undo callable. Gradients change — these are TIMING probes,
    not semantic ablations."""
    import flax.linen as nn
    import jax.numpy as jnp

    import huggingface_asr_tpu.models.ebranchformer as eb

    undos = []
    if mode == "no_attention":
        orig = eb.EBranchformerSelfAttention.__call__

        def fake(self, x, attention_bias=None, pos_emb=None,
                 deterministic=True, lengths=None):
            return x

        eb.EBranchformerSelfAttention.__call__ = fake
        undos.append(lambda: setattr(eb.EBranchformerSelfAttention, "__call__", orig))
    elif mode == "no_cgmlp":
        orig = eb.ConvolutionalGatingMLP.__call__

        def fake(self, x, deterministic=True):
            return x

        eb.ConvolutionalGatingMLP.__call__ = fake
        undos.append(lambda: setattr(eb.ConvolutionalGatingMLP, "__call__", orig))
    elif mode == "no_ff":
        orig = eb.FeedForward.__call__

        def fake(self, x, deterministic=True):
            return x * 0.0

        eb.FeedForward.__call__ = fake
        undos.append(lambda: setattr(eb.FeedForward, "__call__", orig))
    elif mode == "no_dwconv":
        orig = nn.Conv.__call__

        def fake(self, x):
            if self.feature_group_count > 1:  # depthwise convs only
                return x
            return orig(self, x)

        nn.Conv.__call__ = fake
        undos.append(lambda: setattr(nn.Conv, "__call__", orig))
    elif mode == "no_ln":
        orig = nn.LayerNorm.__call__

        def fake(self, x, *a, **kw):
            return x

        nn.LayerNorm.__call__ = fake
        undos.append(lambda: setattr(nn.LayerNorm, "__call__", orig))

    def undo():
        for u in undos:
            u()

    return undo


def build(mode, args):
    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.ops.ctc import ctc_loss
    from huggingface_asr_tpu.ops.spec_augment import SpecAugmentConfig
    from huggingface_asr_tpu.parallel.mesh import MeshConfig, make_mesh
    from huggingface_asr_tpu.training.loop import CTCTrainer, TrainerConfig
    from huggingface_asr_tpu.training.optim import OptimizerConfig

    relpos = {"relpos_factored": "factored", "relpos_gather": "gather"}.get(
        mode, args.relpos
    )
    extra = {}
    if mode == "no_dropout":
        extra.update(hidden_dropout=0.0, attention_dropout=0.0,
                     activation_dropout=0.0, final_dropout=0.0,
                     csgu_conv_dropout=0.0)
    if mode == "remat":
        extra.update(remat=True)
    if mode == "pallas_attn":
        extra.update(attention_impl="pallas")
    if mode == "dwconv_slice":
        extra.update(dwconv_impl="slice")
    config = EBranchformerConfig(
        hidden_size=args.hidden, num_hidden_layers=args.layers,
        num_attention_heads=8, intermediate_size=4 * args.hidden,
        conv_dim=(args.hidden, args.hidden), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
        relpos_impl=relpos, **extra,
    )
    spec_aug = None if mode == "no_specaug" else SpecAugmentConfig(
        apply_time_warp=args.time_warp and mode != "no_time_warp"
    )
    mesh = make_mesh(MeshConfig(data=jax.device_count()))
    trainer = CTCTrainer(
        EBranchformerForCTC(config, dtype=jnp.bfloat16),
        TrainerConfig(
            optimizer=OptimizerConfig(
                learning_rate=2e-3, warmup_steps=1000, total_steps=100000
            ),
            spec_augment=spec_aug,
        ),
        mesh=mesh,
    )

    B, sec = args.batch, args.seconds
    T = int(sec * 100) - 2
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

    use_ctc = mode != "no_ctc"

    def loss_fn_of(params, aug_rng, dropout_rng, step):
        feats, lengths = trainer._featurize(batch)
        feats = trainer._maybe_spec_augment(aug_rng, feats, lengths, step)
        out = trainer.model.apply(
            {"params": params}, feats, lengths,
            labels=batch["labels"] if use_ctc else None,
            label_lengths=batch["label_lengths"] if use_ctc else None,
            deterministic=False, rngs={"dropout": dropout_rng},
        )
        if use_ctc:
            return out.loss, {}
        return out.logits.astype(jnp.float32).mean(), {}

    def one_step(state, _):
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)
        aug_rng, dropout_rng = jax.random.split(step_rng)
        if mode == "fwd_only":
            loss, _aux = loss_fn_of(state.params, aug_rng, dropout_rng, state.step)
            return state.replace(step=state.step + 1), (loss, loss)
        (loss, _aux), grads = jax.value_and_grad(
            lambda p: loss_fn_of(p, aug_rng, dropout_rng, state.step),
            has_aux=True,
        )(state.params)
        if mode == "grads_only":
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads)
            ))
            return state.replace(step=state.step + 1), (loss, gnorm)
        new_state, gnorm, _ok = state.apply_gradients_guarded(
            grads=grads, max_grad_norm_guard=trainer.config.max_grad_norm_guard
        )
        return new_state, (loss, gnorm)

    import jax

    @jax.jit
    def run(state):
        return jax.lax.scan(one_step, state, None, length=args.steps)

    return run, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--label-len", type=int, default=40)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--relpos", default="factored",
                    help="attention relpos_impl for all modes except "
                         "relpos_gather/relpos_factored overrides")
    ap.add_argument("--time-warp", action="store_true")
    ap.add_argument("--rng-impl", default=None,
                    help="jax_default_prng_impl override (e.g. rbg)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--modes", default="full,relpos_factored,no_ctc,no_specaug,fwd_only,grads_only")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.rng_impl:
        jax.config.update("jax_default_prng_impl", args.rng_impl)
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    for mode in args.modes.split(","):
        undo = apply_component_patch(mode)
        run, state = build(mode, args)
        t_c0 = time.perf_counter()
        state2, (losses, _) = run(state)
        jax.block_until_ready(losses)
        compile_s = time.perf_counter() - t_c0
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state2, (losses, _) = run(state2)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
        undo()
        step_ms = min(times) / args.steps * 1e3
        print(json.dumps({
            "mode": mode,
            "step_ms": round(step_ms, 2),
            "train_rtfx": round(args.batch * args.seconds / (step_ms / 1e3), 1),
            "compile_s": round(compile_s, 1),
            "finite": bool(np.isfinite(np.asarray(losses, dtype=np.float32)).all()),
        }), flush=True)


if __name__ == "__main__":
    main()
