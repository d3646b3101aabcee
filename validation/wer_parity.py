"""End-to-end WER validation + cross-framework parity (BASELINE.md item 2).

Zero-egress methodology: no LibriSpeech / hub checkpoints are reachable, so we
(1) train a small E-Branchformer CTC on a deterministic synthetic-speech
    corpus through the REAL CLI entry points (tokenizer → train_ctc → eval),
(2) export the trained checkpoint to the torch reference classes
    (/root/reference/src) and decode the SAME test set with the reference
    implementation,
(3) score both with the same WER module and report the delta (north-star
    fidelity clause: "matching WER") plus measured decode throughput for both
    frameworks on identical hardware (baseline anchor for bench.py).

Run:  python validation/wer_parity.py --work_dir /tmp/wer_val \
          [--steps 3000] [--platform tpu|cpu]
Writes <work_dir>/report.json and prints a markdown table.
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


def build_data(work: str, n_train: int, n_eval: int, hard: bool = False):
    from huggingface_asr_tpu.data.synthetic_speech import build_corpus

    ds_dir = os.path.join(work, "ds_hard" if hard else "ds")
    if not os.path.exists(ds_dir):
        build_corpus(ds_dir, n_train=n_train, n_eval=n_eval, seed=0, hard=hard)
    return ds_dir


def train_tokenizer(work: str, ds_dir: str, vocab: int):
    from huggingface_asr_tpu.cli.train_tokenizer import main as tok_main

    tok_dir = os.path.join(work, "tok")
    if not os.path.exists(os.path.join(tok_dir, "tokenizer_config.json")):
        tok_main([
            "--dataset_name", ds_dir, "--load_from_disk", "--no-do_resample",
            "--tokenizer_type", "unigram", "--vocab_size", str(vocab),
            "--tokenizer_output_dir", tok_dir,
        ])
    return tok_dir


MODEL_CFG = {
    # ~8M params: big enough to master the tone-code corpus quickly.
    "hidden_size": 128, "num_hidden_layers": 4, "num_attention_heads": 4,
    "intermediate_size": 512, "conv_dim": [64, 64], "conv_kernel": [3, 3],
    "conv_stride": [2, 2], "conv_padding": [1, 1],
    "hidden_dropout": 0.1, "attention_dropout": 0.1,
}


def train(work: str, ds_dir: str, tok_dir: str, steps: int, batch: int):
    from huggingface_asr_tpu.cli.train_ctc import main as ctc_main

    out = os.path.join(work, "ctc")
    cfg_path = os.path.join(work, "model.json")
    with open(cfg_path, "w") as f:
        json.dump(MODEL_CFG, f)
    results = ctc_main([
        "--dataset_name", ds_dir, "--load_from_disk", "--no-do_resample",
        "--tokenizer_name", tok_dir, "--model_config", cfg_path,
        "--dtype", "float32", "--output_dir", out,
        "--per_device_train_batch_size", str(batch),
        "--per_device_eval_batch_size", str(batch),
        "--max_steps", str(steps), "--logging_steps", "100",
        "--eval_steps", str(max(steps // 4, 1)), "--save_steps", str(steps),
        "--warmup_steps", str(min(500, steps // 5)),
        "--learning_rate", "2e-3",
        "--max_duration_in_seconds", "6", "--pad_to_multiple", "100",
    ])
    return out, {k: v.metrics for k, v in results.items()}


def reference_decode(work: str, ds_dir: str, tok_dir: str, ckpt: str):
    """Decode the test split with the TORCH REFERENCE model on the exported
    checkpoint; returns (transcripts, wer, decode_seconds, audio_seconds)."""
    import torch

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import datasets
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from models.encoders.e_branchformer import (
        Wav2Vec2EBranchformerConfig,
        Wav2Vec2EBranchformerForCTC,
    )

    from huggingface_asr_tpu.interop.export_hf import export_ebranchformer_ctc
    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
    from huggingface_asr_tpu.training.model_factory import load_config, load_params

    final = os.path.join(ckpt, "final")
    config = load_config(final, EBranchformerConfig)
    params = load_params(final)
    tok = AutoTokenizer.from_pretrained(tok_dir)

    hf_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        intermediate_size=config.intermediate_size,
        conv_dim=list(config.conv_dim), conv_kernel=list(config.conv_kernel),
        conv_stride=list(config.conv_stride), conv_padding=tuple(config.conv_padding),
        num_fbanks=80, num_mel_bins=80, vocab_size=config.vocab_size,
        use_fbanks=True, second_dim_input_size=80, apply_spec_augment=False,
        num_feat_extract_layers=len(config.conv_dim),
        attn_implementation="eager",
        position_embeddings_type=(
            None if config.position_embeddings_type == "none"
            else config.position_embeddings_type
        ),
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        ebranchformer_conv_dropout=0.0, pad_token_id=tok.pad_token_id or 0,
    )
    ref = Wav2Vec2EBranchformerForCTC(hf_cfg)
    sd = export_ebranchformer_ctc(params, config)
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    real_missing = [m for m in missing if "masked_spec_embed" not in m]
    assert not real_missing, f"missing keys: {real_missing[:5]}"
    ref.eval()

    dd = datasets.load_from_disk(ds_dir)["test"]
    frontend = LogMelFrontEnd(LogMelConfig())

    hyps, audio_sec, dec_sec = [], 0.0, 0.0
    for ex in dd:
        wav = np.asarray(ex["audio"], np.float32)
        audio_sec += len(wav) / 16000.0
        # bucket-pad to 1 s so the jitted frontend compiles a handful of
        # shapes instead of one per utterance length
        n = len(wav)
        padded = int(np.ceil(n / 16000.0)) * 16000
        wav_p = np.zeros(padded, np.float32)
        wav_p[:n] = wav
        feats, flens = frontend(jnp.asarray(wav_p)[None], jnp.asarray([n]))
        feats = np.asarray(feats)[:, : int(flens[0])]
        t0 = time.perf_counter()
        with torch.no_grad():
            logits = ref(torch.tensor(feats)).logits
        pred = logits.argmax(-1)[0].numpy()
        dec_sec += time.perf_counter() - t0
        # CTC collapse (blank = LAST logit, reference convention).
        blank = logits.shape[-1] - 1
        toks = [int(p) for i, p in enumerate(pred)
                if p != blank and (i == 0 or p != pred[i - 1])]
        hyps.append(tok.decode(toks, skip_special_tokens=True))
    return hyps, dec_sec, audio_sec


def fused_decode(ds_dir: str, tok_dir: str, ckpt: str):
    """Decode the test split with the FUSED Pallas encoder path
    (models/fast_infer.py) — validates the serving kernel end to end on a
    trained checkpoint. TPU only (Mosaic kernels). Returns transcripts."""
    import datasets
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused
    from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
    from huggingface_asr_tpu.ops.features import LogMelConfig, LogMelFrontEnd
    from huggingface_asr_tpu.training.model_factory import load_config, load_params

    final = os.path.join(ckpt, "final")
    config = load_config(final, EBranchformerConfig)
    params = load_params(final)
    tok = AutoTokenizer.from_pretrained(tok_dir)
    # Pallas mel front end — the SAME front end serving/pipeline.py uses on
    # the fused TPU path, so this validates mel kernel + subsampler kernel +
    # layer kernel end to end on trained weights.
    try:
        from huggingface_asr_tpu.ops.pallas_features import PallasLogMelFrontEnd

        # EXACT serving config (serving/pipeline.py fused path): 3-pass fp32
        # DFT + in-kernel CMVN with bf16 output.
        frontend = PallasLogMelFrontEnd(
            LogMelConfig(matmul_precision="high"), fused_cmvn_bf16=True
        )
    except NotImplementedError:
        frontend = LogMelFrontEnd(LogMelConfig())

    dd = datasets.load_from_disk(ds_dir)["test"]
    wavs = [np.asarray(ex["audio"], np.float32) for ex in dd]
    S = max(len(w) for w in wavs)
    batchw = np.zeros((len(wavs), S), np.float32)
    for i, wv in enumerate(wavs):
        batchw[i, : len(wv)] = wv
    lens = jnp.asarray([len(w) for w in wavs], jnp.int32)

    feats, flens = frontend(jnp.asarray(batchw), lens)
    bb = 4 if len(wavs) % 4 == 0 else 1
    out = ctc_infer_fused(params, config, feats, flens, bb=bb)
    toks, ntoks = ctc_greedy_decode(out.logits, out.logit_lengths, blank_id=-1)
    toks, ntoks = np.asarray(toks), np.asarray(ntoks)
    return [
        tok.decode([int(t) for t in toks[i, : ntoks[i]]], skip_special_tokens=True)
        for i in range(len(wavs))
    ]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/wer_val")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=1024)
    ap.add_argument("--n_eval", type=int, default=64)
    ap.add_argument("--vocab", type=int, default=40)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing checkpoint in work_dir")
    ap.add_argument("--hard", action="store_true",
                    help="discriminative corpus (WER > 0): both stacks must "
                         "agree on ERRORS, not just on easy wins")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.work_dir, exist_ok=True)
    ds_dir = build_data(args.work_dir, args.n_train, args.n_eval, args.hard)
    tok_dir = train_tokenizer(args.work_dir, ds_dir, args.vocab)

    ckpt = os.path.join(args.work_dir, "ctc")
    if args.skip_train and os.path.exists(os.path.join(ckpt, "final")):
        ours = json.load(open(os.path.join(args.work_dir, "ours_metrics.json")))
    else:
        ckpt, metrics = train(args.work_dir, ds_dir, tok_dir, args.steps, args.batch)
        ours = metrics["test"]
        with open(os.path.join(args.work_dir, "ours_metrics.json"), "w") as f:
            json.dump(ours, f)

    # Our transcripts were written by the eval pass; reload for comparison.
    import csv

    ours_rows = list(csv.DictReader(open(os.path.join(ckpt, "predictions_test.csv"))))
    our_hyps = [r["prediction"] for r in ours_rows]
    refs = [r["label"] for r in ours_rows]

    ref_hyps, ref_dec_sec, audio_sec = reference_decode(
        args.work_dir, ds_dir, tok_dir, ckpt
    )

    from huggingface_asr_tpu.utils.metrics import wer as wer_fn

    our_wer = wer_fn(refs, our_hyps)
    ref_wer = wer_fn(refs, ref_hyps)
    n_match = sum(a.strip() == b.strip() for a, b in zip(our_hyps, ref_hyps))

    report = {
        "test_utterances": len(refs),
        "our_wer": round(float(our_wer), 4),
        "reference_wer_on_exported_ckpt": round(float(ref_wer), 4),
        "wer_delta": round(float(our_wer - ref_wer), 4),
        "identical_transcripts": f"{n_match}/{len(refs)}",
        "reference_torch_cpu_decode_rtfx": round(audio_sec / ref_dec_sec, 1),
        "train_metrics": ours,
    }

    import jax

    if jax.default_backend() == "tpu":
        fused_hyps = fused_decode(ds_dir, tok_dir, ckpt)
        fused_wer = wer_fn(refs, fused_hyps)
        n_fused = sum(
            a.strip() == b.strip() for a, b in zip(fused_hyps, ref_hyps)
        )
        report["fused_kernel_wer"] = round(float(fused_wer), 4)
        report["fused_kernel_identical_vs_reference"] = f"{n_fused}/{len(refs)}"
        report["fused_frontend"] = "pallas_mel"
    report["corpus"] = "hard" if args.hard else "easy"
    with open(os.path.join(args.work_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    # merge into the repo-level parity report (shared with aed_parity.py)
    repo_report = os.path.join(REPO, "validation", "wer_parity_report.json")
    merged = {}
    if os.path.exists(repo_report):
        with open(repo_report) as f:
            merged = json.load(f)
    key = "ctc_greedy_hard" if args.hard else None
    if key:
        merged[key] = report
    else:
        merged.update(report)
    with open(repo_report, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(report, indent=2))
    print("\n| metric | ours (JAX/TPU-native) | torch reference |")
    print("|---|---|---|")
    print(f"| WER (same ckpt, same test set) | {our_wer:.4f} | {ref_wer:.4f} |")
    print(f"| identical transcripts | {n_match}/{len(refs)} | — |")
    return report


if __name__ == "__main__":
    main()
