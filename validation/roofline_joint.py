"""A100 roofline anchor for the reference's JOINT beam decode op stream.

Same methodology as roofline_a100.py (per-op charging of the reference's
MEASURED eager op stream; every assumption favors the baseline), applied to
the flagship decode path: HF beam-search `generate()` with the CTC-prefix
rescorer (reference ctc_encoder_plus_autoregressive_decoder.py:450-482 +
ctc_scorer.py:259-354) at the released decode config — num_beams=5,
ctc_weight=0.3, ctc_margin=0 (hf_shared_models/DeCRED_base.py:20-23) — on a
base-size DeCRED (enc 256x12, dec 256x6) over B x 10 s utterances.

The model is random-init (the op stream depends on shapes and step count,
not weight values); decode length is pinned with min/max_new_tokens to the
utterance-typical ~1 token per 6 mel frames so early EOS on random weights
cannot shrink the stream. Writes "a100_joint_rtfx_roofline" into
validation/baseline_measurement.json with --write; validation/joint_bench.py
then reports vs_baseline for the TPU joint decode.
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

from validation.roofline_a100 import (  # noqa: E402
    A100_TF, BYTES_PER_EL, HBM_BPS, LAUNCH_S, MATMUL_EFF,
)

# Op whitelist and per-op cost model: the SAME methodology as
# roofline_a100.py (kept verbatim there for the calibrated CTC anchor),
# extended with the beam-search bookkeeping ops generate() adds
# (topk/sort/gather/logaddexp/...). Every assumption favors the baseline.
MATMUL = {"aten::linear", "aten::matmul", "aten::addmm", "aten::mm",
          "aten::bmm", "aten::baddbmm"}
CONV = {"aten::conv1d", "aten::conv2d", "aten::convolution",
        "aten::_convolution"}
EW = {"aten::gelu", "aten::add", "aten::add_", "aten::mul", "aten::mul_",
      "aten::sub", "aten::div", "aten::_softmax", "aten::softmax",
      "aten::native_layer_norm", "aten::layer_norm", "aten::tanh",
      "aten::sigmoid", "aten::cat", "aten::copy_", "aten::pow",
      "aten::mean", "aten::clamp", "aten::glu", "aten::silu",
      "aten::log_softmax", "aten::_log_softmax", "aten::pad",
      "aten::constant_pad_nd", "aten::masked_fill", "aten::masked_fill_",
      "aten::where", "aten::index_select", "aten::embedding",
      "aten::topk", "aten::sort", "aten::argmax", "aten::cumsum",
      "aten::gather", "aten::scatter", "aten::index_copy_",
      "aten::logsumexp", "aten::exp", "aten::log", "aten::max",
      "aten::repeat_interleave", "aten::stack", "aten::logaddexp",
      "aten::roll", "aten::flip", "aten::logcumsumexp"}
TAKE = MATMUL | CONV | EW


def _op_cost(ev, bytes_per_el):
    """(flops, bytes) from recorded input shapes (roofline_a100.py cost())."""
    s = [list(x) for x in (ev.input_shapes or []) if x]
    k = ev.key
    elems = sum(int(np.prod(x)) for x in s)
    try:
        if k == "aten::linear":            # x, w(out,in), b?
            x_el = int(np.prod(s[0]))
            out_f, in_f = s[1]
            return 2.0 * x_el / in_f * in_f * out_f, (
                x_el + in_f * out_f + x_el // in_f * out_f
            ) * bytes_per_el
        if k in ("aten::addmm",):
            m, kk = s[1]
            n = s[2][1]
            return 2.0 * m * kk * n, (m * kk + kk * n + m * n) * bytes_per_el
        if k == "aten::mm":
            m, kk = s[0]
            n = s[1][1]
            return 2.0 * m * kk * n, (m * kk + kk * n + m * n) * bytes_per_el
        if k in ("aten::bmm", "aten::baddbmm", "aten::matmul"):
            a, b = (s[1], s[2]) if k == "aten::baddbmm" else (s[0], s[1])
            if len(a) >= 2 and len(b) >= 2:
                batch = int(np.prod(a[:-2])) if len(a) > 2 else 1
                m, kk = a[-2], a[-1]
                n = b[-1]
                return 2.0 * batch * m * kk * n, (
                    batch * (m * kk + kk * n + m * n)
                ) * bytes_per_el
        if k in CONV:                      # x, w(Cout, Cin/g, *kern), b?
            x_el = int(np.prod(s[0]))
            wsh = s[1]
            cout = wsh[0]
            cin_g = int(np.prod(wsh[1:]))
            cin = s[0][1]
            out_el = x_el * cout // max(cin, 1)  # stride-1 bound (generous)
            return 2.0 * out_el * cin_g, (
                x_el + out_el + int(np.prod(wsh))
            ) * bytes_per_el
    except (IndexError, ValueError, ZeroDivisionError):
        pass
    # elementwise/norm/bookkeeping: read inputs once, write one output of the
    # largest input's size; softmax/layernorm/sort ~2 passes.
    passes = 2 if ("softmax" in k or "norm" in k or "sort" in k) else 1
    out_el = max((int(np.prod(x)) for x in s), default=0)
    return 0.0, (elems + out_el) * bytes_per_el * passes


def charge_profile(prof):
    """Charge an A100 for every computational op (max of flop/mem/launch)."""
    taken_ids = set()

    def ancestor_taken(ev):
        p = ev.cpu_parent
        while p is not None:
            if id(p) in taken_ids:
                return True
            p = p.cpu_parent
        return False

    total_s = flop_s = mem_s = launch_s = 0.0
    n_ops = 0
    for ev in prof.events():
        if ev.key not in TAKE or ancestor_taken(ev):
            continue
        taken_ids.add(id(ev))
        flops, bytes_touched = _op_cost(ev, BYTES_PER_EL)
        terms = [flops / (A100_TF * MATMUL_EFF), bytes_touched / HBM_BPS,
                 LAUNCH_S]
        t = max(terms)
        total_s += t
        n_ops += 1
        which = int(np.argmax(terms))
        if which == 0:
            flop_s += t
        elif which == 1:
            mem_s += t
        else:
            launch_s += t
    return {"total_s": total_s, "ops": n_ops, "flop_bound_s": flop_s,
            "mem_bound_s": mem_s, "launch_bound_s": launch_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--num-beams", type=int, default=5)
    ap.add_argument("--ctc-weight", type=float, default=0.3)
    ap.add_argument("--decode-tokens", type=int, default=40,
                    help="forced decode length (~1 token / 6 mel frames at "
                         "the reference's unigram-5k vocab)")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    import torch

    from validation.ref_compat import (
        RefJointCompat as RefJoint,
        RefJointConfig,
    )

    from decoding.config import GenerationConfigCustom
    from models.decoders.multi_head_gpt2 import (
        GPT2LMMultiHeadModel,
        GPT2MultiHeadConfig,
    )
    from models.encoders.e_branchformer import (
        Wav2Vec2EBranchformerConfig,
        Wav2Vec2EBranchformerForCTC,
    )

    V = 500
    enc_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=256, num_hidden_layers=12, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=V,
        position_embeddings_type="relative",
        expect_2d_input=True, second_dim_input_size=80,
        attn_implementation="eager",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        ebranchformer_conv_dropout=0.0, pad_token_id=3,
    )
    dec_cfg = GPT2MultiHeadConfig(
        vocab_size=V + 1, n_positions=512, n_embd=256, n_layer=6, n_head=8,
        add_cross_attention=True, head_locations=[], head_weights=[1.0],
        average_logits=False, lsm_factor=0.0, tie_word_embeddings=False,
        attn_implementation="eager",
        bos_token_id=0, eos_token_id=1, pad_token_id=3,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    enc = Wav2Vec2EBranchformerForCTC(enc_cfg)
    dec = GPT2LMMultiHeadModel(dec_cfg)
    joint_cfg = RefJointConfig.from_encoder_decoder_configs(enc_cfg, dec_cfg)
    joint_cfg.ctc_weight = args.ctc_weight
    joint_cfg.shared_lm_head = False
    model = RefJoint(config=joint_cfg, encoder=enc, decoder=dec)
    model.eval()

    B = args.batch
    T_in = int(args.seconds * 100)
    x = torch.randn(B, T_in, 80)
    mask = torch.ones(B, T_in, dtype=torch.long)

    gen_cfg = GenerationConfigCustom(
        num_beams=args.num_beams, ctc_weight=args.ctc_weight, ctc_margin=0,
        max_new_tokens=args.decode_tokens,
        min_new_tokens=args.decode_tokens,  # pin the step count
        bos_token_id=0, eos_token_id=1, pad_token_id=3,
        decoder_start_token_id=0, early_stopping=False, do_sample=False,
    )

    # the reference's _get_logits_processor reads self.generation_config
    # (HF Seq2SeqTrainer assigns it there); replicate that wiring
    model.generation_config = gen_cfg

    from torch.profiler import ProfilerActivity, profile

    with torch.no_grad():
        # warm lazies on a tiny decode
        small = GenerationConfigCustom(**{
            **gen_cfg.to_dict(), "max_new_tokens": 2, "min_new_tokens": 2
        })
        model.generate(inputs=x[:2, :32], attention_mask=mask[:2, :32],
                       generation_config=small)
        with profile(
            activities=[ProfilerActivity.CPU], record_shapes=True,
        ) as prof:
            model.generate(inputs=x, attention_mask=mask,
                           generation_config=gen_cfg)

    r = charge_profile(prof)
    audio_s = B * args.seconds
    rtfx = audio_s / r["total_s"]
    report = {
        "a100_joint_rtfx_roofline": round(rtfx, 1),
        "config": {
            "num_beams": args.num_beams, "ctc_weight": args.ctc_weight,
            "batch": B, "seconds": args.seconds,
            "decode_tokens": args.decode_tokens,
        },
        "modeled_batch_s": round(r["total_s"], 5),
        "ops": r["ops"],
        "flop_bound_s": round(r["flop_bound_s"], 5),
        "mem_bound_s": round(r["mem_bound_s"], 5),
        "launch_bound_s": round(r["launch_bound_s"], 5),
        "assumptions": {
            "A100_TF": A100_TF, "MATMUL_EFF": MATMUL_EFF,
            "HBM_BPS": HBM_BPS, "LAUNCH_S": LAUNCH_S,
            "BYTES_PER_EL": BYTES_PER_EL,
        },
    }
    print(json.dumps(report), flush=True)
    if args.write:
        path = os.path.join(REPO, "validation", "baseline_measurement.json")
        with open(path) as f:
            base = json.load(f)
        # beams=5/ctc0.3 is the released decode config (primary key);
        # other configs (e.g. the LibriSpeech best-decode beams=60/ctc0 —
        # baseline_150e_beam_decode.sh:70-72) get config-suffixed keys.
        suffix = (
            "" if (args.num_beams == 5 and args.ctc_weight == 0.3)
            else f"_beams{args.num_beams}_ctc{args.ctc_weight:g}"
        )
        base["a100_joint_rtfx_roofline" + suffix] = report["a100_joint_rtfx_roofline"]
        base["a100_joint_roofline_detail" + suffix] = {
            k: v for k, v in report.items()
            if k != "a100_joint_rtfx_roofline"
        }
        with open(path, "w") as f:
            json.dump(base, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
