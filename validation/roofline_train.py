"""A100 train-step anchor: roofline over the reference's MEASURED op stream.

Same methodology as validation/roofline_a100.py (per-op A100 charge model
over the actual reference torch implementation's profiled eager op stream,
CPU-calibrated to 5-8% there), applied to the reference's TRAINING step:
forward + backward + grad-norm clip + AdamW, at the LS-960 recipe shape
(B=64 x 10 s per device, reference recipes/librispeech/train_ctc.sh:44-86)
with bf16 AMP semantics (--bf16, the LUMI DeCRED recipes; generous to the
baseline — the LS CTC recipe itself runs fp32, which would be slower).

The reference's train step is HF Trainer's inner loop
(src/utilities/training_utils.py:78-115 GradAwareTrainer.training_step ->
loss.backward -> clip_grad_norm_ -> AdamW.step), model
Wav2Vec2EBranchformerForCTC (src/models/encoders/e_branchformer.py:408-496).

Charge model per op: max(flops/(312 TF x 0.85), bytes/1.6 TB/s, 4.5 us
launch), bf16 traffic. Every assumption favors the baseline (see
roofline_a100.py docstring).

  python validation/roofline_train.py --batch 64 --write
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

A100_TF = 312e12          # dense bf16 tensor-core peak
MATMUL_EFF = 0.85         # generous per-kernel achievable fraction
HBM_BPS = 1.6e12          # A100-80GB effective (2.0 TB/s x 0.8)
LAUNCH_S = 4.5e-6         # CUDA kernel launch floor, eager mode
BYTES_PER_EL = 2          # bf16 activations (favorable to baseline)

MATMUL = {"aten::linear", "aten::matmul", "aten::addmm", "aten::mm",
          "aten::bmm", "aten::baddbmm"}
CONV = {"aten::conv1d", "aten::conv2d", "aten::convolution",
        "aten::_convolution"}
CONV_BWD = {"aten::convolution_backward"}
EW = {"aten::gelu", "aten::add", "aten::add_", "aten::mul", "aten::mul_",
      "aten::sub", "aten::div", "aten::_softmax", "aten::softmax",
      "aten::native_layer_norm", "aten::layer_norm", "aten::tanh",
      "aten::sigmoid", "aten::cat", "aten::copy_", "aten::pow",
      "aten::mean", "aten::clamp", "aten::glu", "aten::silu",
      "aten::log_softmax", "aten::_log_softmax", "aten::pad",
      "aten::constant_pad_nd", "aten::masked_fill", "aten::masked_fill_",
      "aten::where", "aten::index_select", "aten::embedding",
      # backward / loss / optimizer ops (training additions)
      "aten::gelu_backward", "aten::silu_backward", "aten::glu_backward",
      "aten::sigmoid_backward", "aten::tanh_backward",
      "aten::native_layer_norm_backward", "aten::_softmax_backward_data",
      "aten::_log_softmax_backward_data", "aten::threshold_backward",
      "aten::embedding_dense_backward", "aten::masked_fill_backward",
      "aten::sum", "aten::neg", "aten::exp", "aten::sqrt", "aten::addcdiv_",
      "aten::addcmul_", "aten::lerp_", "aten::zero_", "aten::fill_",
      "aten::_ctc_loss", "aten::_ctc_loss_backward", "aten::ctc_loss",
      "aten::linalg_vector_norm", "aten::norm", "aten::stack",
      "aten::_foreach_add_", "aten::_foreach_mul_", "aten::_foreach_sqrt",
      "aten::_foreach_div_", "aten::_foreach_addcdiv_",
      "aten::_foreach_addcmul_", "aten::_foreach_lerp_",
      "aten::_foreach_norm", "aten::_foreach_div", "aten::_foreach_sqrt_",
      "aten::_to_copy", "aten::to"}
TAKE = MATMUL | CONV | CONV_BWD | EW


def cost(ev):
    """(flops, bytes) from recorded input shapes (see roofline_a100.py)."""
    s = [list(x) for x in (ev.input_shapes or []) if x]
    k = ev.key
    elems = sum(int(np.prod(x)) for x in s)
    try:
        if k == "aten::linear":
            x_el = int(np.prod(s[0]))
            out_f, in_f = s[1]
            return 2.0 * x_el / in_f * in_f * out_f, (
                x_el + in_f * out_f + x_el // in_f * out_f
            ) * BYTES_PER_EL
        if k == "aten::addmm":
            m, kk = s[1]
            n = s[2][1]
            return 2.0 * m * kk * n, (m * kk + kk * n + m * n) * BYTES_PER_EL
        if k == "aten::mm":
            m, kk = s[0]
            n = s[1][1]
            return 2.0 * m * kk * n, (m * kk + kk * n + m * n) * BYTES_PER_EL
        if k in ("aten::bmm", "aten::baddbmm", "aten::matmul"):
            a, b = (s[1], s[2]) if k == "aten::baddbmm" else (s[0], s[1])
            if len(a) >= 2 and len(b) >= 2:
                batch = int(np.prod(a[:-2])) if len(a) > 2 else 1
                m, kk = a[-2], a[-1]
                n = b[-1]
                return 2.0 * batch * m * kk * n, (
                    batch * (m * kk + kk * n + m * n)
                ) * BYTES_PER_EL
        if k in CONV:
            x_el = int(np.prod(s[0]))
            wsh = s[1]
            cout = wsh[0]
            cin_g = int(np.prod(wsh[1:]))
            cin = s[0][1]
            out_el = x_el * cout // max(cin, 1)  # stride-1 bound (generous)
            return 2.0 * out_el * cin_g, (
                x_el + out_el + int(np.prod(wsh))
            ) * BYTES_PER_EL
        if k in CONV_BWD:
            # inputs: grad_output, input, weight. grad_input + grad_weight
            # each cost ~forward FLOPs -> 2x forward, traffic = all three
            # tensors + both grads.
            g_el = int(np.prod(s[0]))
            x_el = int(np.prod(s[1]))
            wsh = s[2]
            cin_g = int(np.prod(wsh[1:]))
            fwd_flops = 2.0 * g_el * cin_g
            return 2.0 * fwd_flops, (
                g_el + 2 * x_el + 2 * int(np.prod(wsh))
            ) * BYTES_PER_EL
    except (IndexError, ValueError, ZeroDivisionError):
        pass
    passes = 2 if "softmax" in k or "norm" in k or "ctc" in k else 1
    out_el = max((int(np.prod(x)) for x in s), default=0)
    return 0.0, (elems + out_el) * BYTES_PER_EL * passes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--label-len", type=int, default=40)
    ap.add_argument("--fp32", action="store_true",
                    help="profile without AMP (the LS CTC recipe's actual "
                         "precision); default is bf16 autocast (generous)")
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    import torch

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    from models.encoders.e_branchformer import (
        Wav2Vec2EBranchformerConfig,
        Wav2Vec2EBranchformerForCTC,
    )

    hf_cfg = Wav2Vec2EBranchformerConfig(
        hidden_size=256, num_hidden_layers=12, num_attention_heads=8,
        intermediate_size=1024, conv_dim=(256, 256), conv_kernel=(3, 3),
        conv_stride=(2, 2), conv_padding=(1, 1), vocab_size=500,
        position_embeddings_type="relative",
        expect_2d_input=True, second_dim_input_size=80,
        attn_implementation="eager",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        ebranchformer_conv_dropout=0.0,
        ctc_loss_reduction="mean", ctc_zero_infinity=True,
        # the reference applies ESPnet SpecAug host-side in the transform
        # chain (configs/default_data_preprocessing2d.json), not HF's
        # in-model masking — keep the device op stream clean of it
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = Wav2Vec2EBranchformerForCTC(hf_cfg)
    model.train()
    # reference recipe optimizer: adamw_torch, lr 2e-3, wd 1e-6
    # (recipes/librispeech/train_ctc.sh:54-59)
    opt = torch.optim.AdamW(model.parameters(), lr=2e-3, weight_decay=1e-6,
                            foreach=True)

    B = args.batch
    T_in = int(args.seconds * 100)
    x = torch.randn(B, T_in, 80)
    labels = torch.randint(1, hf_cfg.vocab_size, (B, args.label_len))

    from contextlib import nullcontext

    from torch.profiler import ProfilerActivity, profile

    amp = (nullcontext() if args.fp32
           else torch.autocast("cpu", dtype=torch.bfloat16))

    def step(inp, lab):
        mask = torch.ones(inp.shape[0], inp.shape[1], dtype=torch.long)
        with amp:
            out = model(inp, attention_mask=mask, labels=lab)
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        opt.zero_grad(set_to_none=True)

    step(x[:2, :32], labels[:2, :4])  # warm lazies + optimizer state
    with profile(
        activities=[ProfilerActivity.CPU],
        record_shapes=True,
    ) as prof:
        step(x, labels)

    taken_ids = set()

    def ancestor_taken(ev):
        p = ev.cpu_parent
        while p is not None:
            if id(p) in taken_ids:
                return True
            p = p.cpu_parent
        return False

    total_s = 0.0
    n_ops = 0
    flop_s = mem_s = launch_s = 0.0
    total_flops = 0.0
    for ev in prof.events():
        if ev.key not in TAKE or ancestor_taken(ev):
            continue
        taken_ids.add(id(ev))
        flops, bytes_touched = cost(ev)
        total_flops += flops
        terms = [
            flops / (A100_TF * MATMUL_EFF),
            bytes_touched / HBM_BPS,
            LAUNCH_S,
        ]
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

    audio_s = B * args.seconds
    rtfx = audio_s / total_s
    report = {
        "a100_train_rtfx": round(rtfx, 1),
        "modeled_step_s": round(total_s, 5),
        "batch": B,
        "amp": "fp32" if args.fp32 else "bf16",
        "ops": n_ops,
        "flop_bound_s": round(flop_s, 5),
        "mem_bound_s": round(mem_s, 5),
        "launch_bound_s": round(launch_s, 5),
        "total_matmul_flops": total_flops,
        "assumptions": {
            "A100_TF": A100_TF, "MATMUL_EFF": MATMUL_EFF,
            "HBM_BPS": HBM_BPS, "LAUNCH_S": LAUNCH_S,
            "BYTES_PER_EL": BYTES_PER_EL,
        },
    }
    print(json.dumps(report), flush=True)

    if args.write:
        path = os.path.join(REPO, "validation", "train_baseline.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
