"""Per-op MXU-utilization table from a jax.profiler perfetto trace.

The TPU trace annotates every XLA op occurrence with `model_flops`,
`bytes_accessed`, and `device_duration_ps`, so achieved FLOP/s (and thus
%-of-peak MXU) and achieved HBM bandwidth are exact per op — no shape
modeling needed. This answers VERDICT r2 weak #5: is the non-MFU remainder
chip physics (MXU underfill / VPU work) or recoverable?

Usage: python tools/mxu_table.py <perfetto_trace.json.gz> [--peak-tflops 197]
       [--hbm-gbs 819] [--top N]

Groups ops by (hlo_category, model component from the tf_op in long_name /
metadata), prints time share, achieved TFLOP/s, % MXU peak, achieved GB/s,
and arithmetic intensity — then a roofline verdict per group (compute-bound
at intensity > peak_flops/hbm_bw ~ 240 flop/byte for v5e bf16).
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re


def categorize(name: str, ident: str) -> str:
    t = ident
    tower = "visual" if "visual" in t else ("text" if "text" in t else "")
    bwd = "bwd" if "transpose(jvp" in t else "fwd"
    if "optax" in t or "opt_state" in t:
        return "optimizer"
    for pat, lab in (
        # FastViT/MCi + ConvNeXt/ViTamin tower components (r5): depthwise
        # convs are VPU work with their own (BW) roofline — split them out
        # from the matmul-shaped 1x1/fc ops.
        (r"mixer_dw|conv_dw|pos_emb_dw|dwconv|depthwise", "dwconv"),
        (r"stem_conv|patch_emb|downsample|conv_pw|head_conv|stem", "convstem"),
        (r"mlp/|c_fc|c_proj|mlp\.py|ffn/fc|/fc1|/fc2", "mlp"),
        (r"attn|in_proj|out_proj|dot_product|softmax|layers\.py|fused_attn|_fwd_kernel|_bwd_kernel", "attn"),
        (r"ln_|layer_norm|norm\.py", "layernorm"),
        (r"conv1", "patchify"),
        (r"token_embedding|embedding", "embed"),
        (r"contrastive\.py|fused_loss|log_softmax|pos_mask", "loss"),
    ):
        if re.search(pat, t):
            if lab == "loss":
                return lab
            return f"{tower or 'model'}/{lab}/{bwd}"
    kind = name.split(".")[0]
    if kind in ("copy", "copy-start", "copy-done", "slice-start", "slice-done"):
        return "copies"
    return f"{tower}/other/{bwd}" if tower else "other"


_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s8": 1, "u8": 1,
                "s32": 4, "u32": 4, "pred": 1}


def _shapes(txt: str):
    """[(dtype, dims), ...] for every `dtype[d0,d1,..]` in `txt`."""
    return [
        (m.group(1), tuple(int(x) for x in m.group(2).split(",") if x))
        for m in re.finditer(r"(\w+)\[([\d,]*)\]", txt)
    ]


def pallas_attn_estimate(long_name: str):
    """Analytic (flops, bytes) for ops/fused_attn.py packed-kernel
    custom-calls — the trace reports model_flops=0/bytes_accessed=0 for
    Pallas kernels, which silently understates their component's MXU/BW
    aggregates. Shapes come from the HLO long_name; every block streams
    HBM->VMEM exactly once per grid program, so bytes = sum of operand +
    result buffer sizes. Matmul flops: fwd = QK^T + PV = 4*B*H*N^2*D;
    bwd = s recompute + dv + dp + dq + dk = 10*B*H*N^2*D; the in-kernel
    rope rotation adds 2 (fwd) / 4 (bwd) [N,D]x[D,D] matmuls per head."""
    m = re.match(r"%\S+ = \((.*?)\) custom-call\((.*)", long_name, re.S)
    if not m:
        return None
    results = _shapes(m.group(1))
    op_txt = m.group(2).split("custom_call_target")[0]
    operands = _shapes(op_txt)
    nbytes = sum(
        _DTYPE_BYTES.get(dt, 4) * _prod(dims) for dt, dims in results + operands
    )
    lse = next((dims for dt, dims in results + operands
                if dt == "f32" and len(dims) == 3), None)
    o = next((dims for dt, dims in results if len(dims) == 3 and dt != "f32"), None)
    if lse is None or o is None:
        return 0, nbytes
    b, n, hd = o
    h = lse[1]
    d = hd // h
    rope = any(len(dims) == 2 for dt, dims in operands)
    if len(results) >= 3:  # bwd: dq, dk, dv out
        flops = 10 * b * h * n * n * d + (8 * b * h * n * d * d if rope else 0)
    else:  # fwd: o, lse out
        flops = 4 * b * h * n * n * d + (4 * b * h * n * d * d if rope else 0)
    return flops, nbytes


def _prod(dims):
    out = 1
    for x in dims:
        out *= x
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak of the chip (v5e: 197)")
    ap.add_argument("--hbm-gbs", type=float, default=819.0,
                    help="HBM bandwidth GB/s (v5e: 819)")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    with gzip.open(args.trace, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # XLA Ops thread: pid/tid discovered from thread_name metadata
    op_tid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and \
                e.get("args", {}).get("name") == "XLA Ops":
            op_tid = (e["pid"], e["tid"])
            break
    assert op_tid, "no 'XLA Ops' thread in trace"

    Agg = lambda: {"dur": 0.0, "flops": 0.0, "bytes": 0.0, "n": 0}
    groups = collections.defaultdict(Agg)
    per_op = collections.defaultdict(Agg)
    total_dur = 0.0
    n_estimated = 0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) != op_tid:
            continue
        a = e.get("args", {})
        name = e["name"]
        if name.startswith("while"):
            continue  # outer loop span double-counts its body
        dur_s = float(a.get("device_duration_ps", 0)) / 1e12
        flops = float(a.get("model_flops", 0) or 0)
        nbytes = float(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        ident = " ".join((a.get("tf_op", ""), a.get("source_stack", ""),
                          a.get("long_name", "")))
        if (not flops and not nbytes and a.get("hlo_category") == "custom-call"
                and "fused_attn.py" in ident):
            est = pallas_attn_estimate(a.get("long_name", ""))
            if est:
                flops, nbytes = float(est[0]), float(est[1])
                n_estimated += 1
        cat = categorize(name, ident)
        for tab, key in ((groups, cat), (per_op, name)):
            g = tab[key]
            g["dur"] += dur_s
            g["flops"] += flops
            g["bytes"] += nbytes
            g["n"] += 1
            g["cat"] = cat
        total_dur += dur_s

    ridge = args.peak_tflops * 1e12 / (args.hbm_gbs * 1e9)
    print(f"device op busy: {total_dur:.3f}s   MXU peak {args.peak_tflops} TF/s"
          f"   HBM {args.hbm_gbs} GB/s   ridge {ridge:.0f} flop/byte\n")

    def row(label, g):
        dur, fl, by = g["dur"], g["flops"], g["bytes"]
        tfs = fl / dur / 1e12 if dur else 0.0
        gbs = by / dur / 1e9 if dur else 0.0
        inten = fl / by if by else 0.0
        bound = "compute" if inten > ridge else ("memory" if by else "-")
        print(f"{label:34s} {dur:7.3f}s {100*dur/total_dur:5.1f}% "
              f"{tfs:7.1f} TF/s {100*tfs/args.peak_tflops:5.1f}%MXU "
              f"{gbs:6.0f} GB/s {100*gbs/args.hbm_gbs:5.1f}%BW "
              f"{inten:6.0f} f/B {bound}")

    print("== by component ==")
    for k, g in sorted(groups.items(), key=lambda kv: -kv[1]["dur"]):
        row(k, g)

    print(f"\n== top {args.top} individual ops ==")
    top = sorted(per_op.items(), key=lambda kv: -kv[1]["dur"])[: args.top]
    for k, g in top:
        row(f"{k} [{g['cat']}]", g)

    tot_fl = sum(g["flops"] for g in groups.values())
    print(f"\ntotal model_flops/run: {tot_fl/1e12:.2f} TF"
          f"   overall {tot_fl/total_dur/1e12:.1f} TF/s"
          f" = {100*tot_fl/total_dur/1e12/args.peak_tflops:.1f}% MXU peak")
    if n_estimated:
        print(f"({n_estimated} Pallas fused_attn custom-calls report no "
              "model_flops/bytes in the trace; their flops/bytes above are "
              "ANALYTIC estimates from the HLO shapes)")


if __name__ == "__main__":
    main()
