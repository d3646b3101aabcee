"""Benchmark: batched E-Branchformer CTC inference throughput (RTFx) on TPU.

Measures audio-seconds of speech processed per wall-clock second per chip for
the flagship base-size E-Branchformer CTC model (mel front end + encoder +
CTC greedy decode, all one compiled program). Prints ONE JSON line.

vs_baseline is measured against the single-A100 RTFx target derived from the
driver BASELINE.json north star (≥10× single-A100 RTFx ≈ 10 × ~1390 RTFx for
a comparable ~40M-param CTC encoder at batch 64); until the reference A100
number can be measured on real hardware we report the ratio against
A100_RTFX_ESTIMATE below.
"""

import json
import time

import numpy as np

# Estimated single-A100 RTFx for a comparable-size (~40M param) E-Branchformer
# CTC at batch 64 with fp16 — stand-in until measured (BASELINE.md).
A100_RTFX_ESTIMATE = 1400.0


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
                "unit": "audio-sec/sec/chip (B=128, 10s utts, mel+encoder+greedy fused)",
                "vs_baseline": round(rtfx / A100_RTFX_ESTIMATE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
