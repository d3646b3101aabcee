"""Bottom-up A100 anchor: roofline over the reference's MEASURED op stream.

The north-star ratio needs an A100 RTFx number for the reference (torch,
eager) E-Branchformer CTC inference, but no A100 exists in this environment.
Round-1 used a guess (1400, indefensibly low); the round-2 interim anchor was
"312 TF x 0.35 assumed MFU" (a favorable-to-baseline scalar guess). This
script replaces guessing with a per-op model:

  1. Run the ACTUAL reference torch model (read-only mount) under
     torch.profiler on CPU with record_shapes, for the bench workload
     (B=128, 10 s utterances -> 1000 mel frames). This yields the real eager
     op stream: every kernel launch with its tensor shapes.
  2. For each op, charge an A100 the max of:
       - matmul/conv FLOPs / (312 TF/s x 0.85 achievable)   [tensor core]
       - bytes touched / (1.6 TB/s effective HBM)            [memory bound]
       - 4.5 us kernel-launch floor                          [eager overhead]
     assuming bf16 activations (2 B/elem — favorable: fp32 would double
     traffic), and sum over the stream.

Assumptions all favor the baseline: 85% tensor-core efficiency on every
matmul regardless of shape, perfect fusion-free-but-overlap-free execution,
no Python/dispatch overhead beyond the CUDA launch floor, no D2H syncs.
Prints a JSON report and (with --write) updates
validation/baseline_measurement.json's "a100_rtfx_roofline" field.
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


def _measure_cpu_bw() -> float:
    """Single-thread numpy triad bandwidth (bytes/s, read+write counted)."""
    import time as _t

    n = 50_000_000
    a = np.zeros(n, np.float32)
    b = np.ones(n, np.float32)
    c = np.full(n, 2.0, np.float32)
    np.add(b, c, out=a)  # warm
    t0 = _t.perf_counter()
    for _ in range(3):
        np.add(b, c, out=a)
    dt = (_t.perf_counter() - t0) / 3
    return 3 * n * 4 / dt  # 2 reads + 1 write


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--calibrate-cpu", action="store_true",
        help="apply the same per-op model with THIS host's single-core "
        "constants and compare against the measured torch CPU RTFx — "
        "quantifies how generous the methodology is to the baseline",
    )
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
    )
    torch.manual_seed(0)
    model = Wav2Vec2EBranchformerForCTC(hf_cfg)
    model.eval()

    B = args.batch
    T_in = int(args.seconds * 100)  # 10 ms hop -> mel frames
    x = torch.randn(B, T_in, 80)

    from torch.profiler import ProfilerActivity, profile

    with torch.no_grad():
        model(x[:2, :8])  # warm lazies
        with profile(
            activities=[ProfilerActivity.CPU],
            record_shapes=True,
            with_flops=True,
        ) as prof:
            model(x)

    # Computational ops only — metadata ops (view/as_strided/resize_/empty/
    # transpose/resolve_conj) are free on GPU (no kernel). We take the
    # HIGHEST whitelisted node in each event subtree (aten::linear covers its
    # internal addmm/copies) so nothing is double-counted, and derive
    # flops/bytes from recorded shapes.
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
          "aten::where", "aten::index_select", "aten::embedding"}
    TAKE = MATMUL | CONV | EW

    def cost(ev):
        """(flops, bytes) from recorded input shapes."""
        s = [list(x) for x in (ev.input_shapes or []) if x]
        k = ev.key
        elems = sum(int(np.prod(x)) for x in s)
        try:
            if k == "aten::linear":            # x, w(out,in), b?
                x_el = int(np.prod(s[0]))
                out_f, in_f = s[1]
                return 2.0 * x_el / in_f * in_f * out_f, (
                    x_el + in_f * out_f + x_el // in_f * out_f
                ) * BYTES_PER_EL
            if k in ("aten::addmm",):
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
            if k in CONV:                      # x, w(Cout, Cin/g, *kern), b?
                x_el = int(np.prod(s[0]))
                wsh = s[1]
                cout = wsh[0]
                cin_g = int(np.prod(wsh[1:]))
                cin = s[0][1]
                out_el = x_el * cout // max(cin, 1)  # stride-1 bound (generous)
                return 2.0 * out_el * cin_g, (
                    x_el + out_el + int(np.prod(wsh))
                ) * BYTES_PER_EL
        except (IndexError, ValueError, ZeroDivisionError):
            pass
        # elementwise/norm: read inputs once, write one output of the largest
        # input's size; softmax/layernorm do ~2 passes.
        passes = 2 if "softmax" in k or "norm" in k else 1
        out_el = max((int(np.prod(x)) for x in s), default=0)
        return 0.0, (elems + out_el) * BYTES_PER_EL * passes

    if args.calibrate_cpu:
        global A100_TF, MATMUL_EFF, HBM_BPS, LAUNCH_S, BYTES_PER_EL
        base = json.load(
            open(os.path.join(REPO, "validation", "baseline_measurement.json"))
        )
        A100_TF = base["cpu_gemm_flops"]  # measured 1-core GEMM budget
        MATMUL_EFF = 1.0
        HBM_BPS = _measure_cpu_bw()
        LAUNCH_S = 1.0e-6                  # eager CPU dispatch floor
        BYTES_PER_EL = 4                   # torch CPU runs fp32

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
    key = "cpu_rtfx_roofline" if args.calibrate_cpu else "a100_rtfx_roofline"
    report = {
        key: round(rtfx, 1),
        "modeled_batch_s": round(total_s, 5),
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
        path = os.path.join(REPO, "validation", "baseline_measurement.json")
        with open(path) as f:
            base = json.load(f)
        if args.calibrate_cpu:
            base["cpu_roofline_calibration"] = {
                **report,
                "measured_cpu_rtfx": base.get(
                    "reference_torch_cpu_rtfx_1core"
                ),
            }
        else:
            base["a100_rtfx_roofline"] = report["a100_rtfx_roofline"]
            base["a100_roofline_detail"] = {
                k: v for k, v in report.items() if k != "a100_rtfx_roofline"
            }
        with open(path, "w") as f:
            json.dump(base, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
