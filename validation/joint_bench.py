"""Joint CTC+attention beam-decode RTFx on real TPU.

Benchmarks the compiled joint beam search (decoding/beam_search.py) on a
base-size DeCRED-style model at the reference decode configs:
  * beams=5, ctc_weight=0.3 (released checkpoints' defaults,
    reference hf_shared_models/DeCRED_base.py:20-23)
  * beams=60, ctc_weight=0.0 (LibriSpeech AED best-decode config,
    reference recipes_v0.0.1/librispeech_aed/decoding/baseline_150e_beam_decode.sh:70-72)
each with early_exit on (the lax.while_loop path) and off (fixed-step scan),
on B x 10 s utterances. Prints one JSON line per variant.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--variants", default="b5_ee,b5_scan,b60_ee")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huggingface_asr_tpu.decoding.beam_search import BeamSearchConfig
    from huggingface_asr_tpu.decoding.generate import generate_joint
    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.gpt2_decoder import GPT2DecoderConfig
    from huggingface_asr_tpu.models.joint_ctc_aed import (
        JointCTCAttentionConfig,
        JointCTCAttentionEncoderDecoder,
    )
    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd

    enc_cfg = EBranchformerConfig(
        hidden_size=256, num_hidden_layers=12, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
    )
    dec_cfg = GPT2DecoderConfig(
        vocab_size=501, n_layer=6, n_head=8, n_embd=256,
        add_cross_attention=True,
    )
    cfg = JointCTCAttentionConfig(encoder=enc_cfg, decoder=dec_cfg, ctc_weight=0.3)
    model = JointCTCAttentionEncoderDecoder(cfg, dtype=jnp.bfloat16)
    frontend = LogMelFrontEnd(LogMelConfig())

    B, sec = args.batch, args.seconds
    S = int(16000 * sec)
    rng = np.random.default_rng(0)
    waves = [
        jnp.asarray(rng.standard_normal((B, S)).astype(np.float32) * 0.1)
        for _ in range(args.iters)
    ]
    wl = jnp.full((B,), S, jnp.int32)
    feats0, flens0 = frontend(waves[0][:1], wl[:1])
    params = model.init(
        jax.random.key(0), feats0, flens0,
        labels=jnp.zeros((1, 4), jnp.int32),
        label_lengths=jnp.asarray([4], jnp.int32),
    )["params"]

    variants = {
        "b5_ee": dict(num_beams=5, ctc_weight=0.3, early_exit=True),
        "b5_scan": dict(num_beams=5, ctc_weight=0.3, early_exit=False),
        "b60_ee": dict(num_beams=60, ctc_weight=0.0, early_exit=True),
        "b60_scan": dict(num_beams=60, ctc_weight=0.0, early_exit=False),
    }

    # A100 roofline anchor for the reference's joint beam decode op stream
    # (validation/roofline_joint.py; beams=5/ctc 0.3): vs_baseline for the
    # b5 variants = 8-chip pod rate / anchor, same convention as bench.py.
    anchors = {}
    try:
        with open(os.path.join(
            REPO, "validation", "baseline_measurement.json"
        )) as f:
            base = json.load(f)
        anchors[(5, 0.3)] = base.get("a100_joint_rtfx_roofline")
        anchors[(60, 0.0)] = base.get("a100_joint_rtfx_roofline_beams60_ctc0")
    except OSError:
        pass

    for name in args.variants.split(","):
        kw = variants[name.strip()]
        bcfg = BeamSearchConfig(max_length=args.max_length, **kw)

        @jax.jit
        def run(params, wav):
            feats, flens = frontend(wav, wl)
            seqs, scores = generate_joint(model, params, feats, flens, bcfg)
            return seqs[:, 0, :].sum() + scores.sum()

        float(run(params, waves[0]))
        t0 = time.perf_counter()
        outs = [run(params, waves[i]) for i in range(args.iters)]
        for o in outs:
            float(o)  # value fetch: forces execution through the transport
        dt = (time.perf_counter() - t0) / args.iters
        rec = {
            "variant": name, "ms": round(dt * 1e3, 1),
            "rtfx": round(B * sec / dt, 1),
        }
        anchor = anchors.get((kw["num_beams"], kw["ctc_weight"]))
        if anchor:
            rec["vs_baseline"] = round(B * sec / dt * 8 / anchor, 2)
            rec["baseline"] = f"a100_joint_roofline={anchor}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
