"""Analytical multi-chip scaling model for the mrclip_tpu train step.

Single-chip throughput is measured (bench.py, CLAUDE.md table); multi-chip
hardware is not available in this environment, so this tool projects
pairs/sec/chip on a v5e pod from first principles: per-step ICI
communication volume of the ACTUAL sharding design (parallel/mesh.py —
dp feature gather + fp32 grad all-reduce; ZeRO-3 fsdp param
all-gather/reduce-scatter; Megatron tp with one psum per block direction)
against ring-collective time on the torus, per the standard roofline
recipe (jax-ml.github.io/scaling-book).

Conservative by construction: no compute/comm overlap is assumed (XLA
overlaps the dp/fsdp collectives with the backward pass in practice), and
ICI bandwidth defaults are one bidirectional ring (2 links x 45 GB/s
one-way per link, the v5e figure); override with --ici-gbps/--links.

Usage:
  python tools/scaling_model.py                      # ViT-B-16 defaults
  python tools/scaling_model.py --pairs-per-sec 863.5 --batch-per-chip 88
  python tools/scaling_model.py --model ViT-L-14 --pairs-per-sec 228 \
      --batch-per-chip 16 --strategies dp,fsdp,fsdp+tp4
"""

from __future__ import annotations

import argparse
import json
import math

# (params_M, vision seq len, vision width, text seq len, text width,
#  vision layers, text layers, embed dim)
_FAMILIES = {
    "ViT-B-16": dict(params_m=149.6, n_v=197, w_v=768, n_t=98, w_t=512,
                     l_v=12, l_t=12, d=512),
    "ViT-B-32": dict(params_m=151.3, n_v=50, w_v=768, n_t=98, w_t=512,
                     l_v=12, l_t=12, d=512),
    "ViT-L-14": dict(params_m=427.6, n_v=257, w_v=1024, n_t=98, w_t=768,
                     l_v=24, l_t=12, d=768),
    "ViT-H-14": dict(params_m=632.0, n_v=257, w_v=1280, n_t=98, w_t=1024,
                     l_v=32, l_t=24, d=1024),
}

# Measured single-chip operating points (v5e-lite, bench.py; CLAUDE.md)
_MEASURED = {
    "ViT-B-16": (863.5, 88),
    "ViT-B-32": (2058.0, 256),
    "ViT-L-14": (228.2, 16),
    "ViT-H-14": (94.0, 16),
}


def _ring(bytes_sharded_result: float, axis: int, beta: float) -> float:
    """Seconds for an all-gather/reduce-scatter whose FULL tensor is
    `bytes_sharded_result` over a ring of `axis` chips at `beta` B/s."""
    if axis <= 1:
        return 0.0
    return bytes_sharded_result * (axis - 1) / axis / beta


def step_times(cfg, pairs_s, b_chip, W, strategy, beta):
    """(compute_s, comm_s) for one optimizer step of the global batch."""
    dp = W
    fsdp = tp = 1
    if "tp" in strategy:
        tp = int(strategy.split("tp")[1] or 2)
    if strategy.startswith("fsdp"):
        fsdp = max(W // tp, 1)
        dp = 1
    else:
        dp = max(W // tp, 1)

    p_bytes = cfg["params_m"] * 1e6 * 4  # fp32 master params/grads
    # One replica's b_chip pairs spread over tp chips. Holding MXU
    # efficiency constant at 1/tp width is optimistic (narrower matmuls
    # underfill the MXU) — tp rows are an upper bound on that axis.
    compute = b_chip / pairs_s / tp

    comm = 0.0
    data_axis = dp * fsdp  # batch shards over both data-like axes
    # Global-batch feature gather (losses/gather.py): 2 towers, bf16 [GB, D]
    # all-gather forward + the mirrored grad reduce backward.
    gb = b_chip * data_axis
    feat = gb * cfg["d"] * 2 * 2  # 2 towers, bf16
    comm += 2 * _ring(feat, data_axis, beta)

    if dp > 1:
        # gradient all-reduce = reduce-scatter + all-gather of P
        comm += 2 * _ring(p_bytes, dp, beta)
    if fsdp > 1:
        # ZeRO-3: param all-gather (fwd), param all-gather (bwd recompute
        # of gathered weights), grad reduce-scatter
        comm += 3 * _ring(p_bytes, fsdp, beta)
    if tp > 1:
        # Megatron blocks: one psum after attention + one after MLP, fwd
        # and bwd (= 4 all-reduces per block) on bf16 [b, N, width] acts.
        for n, w, layers in ((cfg["n_v"], cfg["w_v"], cfg["l_v"]),
                             (cfg["n_t"], cfg["w_t"], cfg["l_t"])):
            act = b_chip * n * w * 2
            comm += 4 * layers * 2 * _ring(act, tp, beta)
    return compute, comm


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="ViT-B-16", choices=sorted(_FAMILIES))
    ap.add_argument("--pairs-per-sec", type=float, default=None,
                    help="measured single-chip pairs/s (default: bench table)")
    ap.add_argument("--batch-per-chip", type=int, default=None)
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="one-way GB/s per ICI link (v5e ~45)")
    ap.add_argument("--links", type=int, default=2,
                    help="links per ring (2 = one bidirectional ring)")
    ap.add_argument("--chips", default="4,8,16,32,64,128,256,384")
    ap.add_argument("--strategies", default="dp,fsdp,dp+tp2,fsdp+tp2")
    ap.add_argument("--json", action="store_true", help="one JSON line per row")
    args = ap.parse_args(argv)

    cfg = _FAMILIES[args.model]
    pairs_s, b_chip = _MEASURED[args.model]
    if args.pairs_per_sec:
        pairs_s = args.pairs_per_sec
    if args.batch_per_chip:
        b_chip = args.batch_per_chip
    beta = args.ici_gbps * 1e9 * args.links

    rows = []
    for W in (int(c) for c in args.chips.split(",")):
        for strat in args.strategies.split(","):
            tp = int(strat.split("tp")[1] or 2) if "tp" in strat else 1
            if W % tp or (tp > 1 and W == tp and not strat.startswith("fsdp")):
                continue
            compute, comm = step_times(cfg, pairs_s, b_chip, W, strat, beta)
            # pairs/s/chip = b_chip pairs per replica-step / (step time x
            # the tp chips the replica occupies); efficiency is vs the
            # measured single-chip rate.
            pps_chip = b_chip / (compute + comm) / tp
            rows.append(dict(
                chips=W, strategy=strat, global_batch=b_chip * (W // tp),
                step_ms=round((compute + comm) * 1e3, 2),
                comm_ms=round(comm * 1e3, 2),
                pairs_per_sec_chip=round(pps_chip, 1),
                efficiency_pct=round(100 * pps_chip / pairs_s, 1),
            ))

    if args.json:
        for r in rows:
            print(json.dumps(r))
        return rows
    hdr = f"{args.model}: {pairs_s} pairs/s/chip measured at b{b_chip}, " \
          f"ICI ring {beta / 1e9:.0f} GB/s (no-overlap lower bound)"
    print(hdr)
    print(f"{'chips':>6} {'strategy':>10} {'global_b':>9} {'step_ms':>8} "
          f"{'comm_ms':>8} {'pairs/s/chip':>13} {'eff%':>6}")
    for r in rows:
        print(f"{r['chips']:>6} {r['strategy']:>10} {r['global_batch']:>9} "
              f"{r['step_ms']:>8} {r['comm_ms']:>8} "
              f"{r['pairs_per_sec_chip']:>13} {r['efficiency_pct']:>6}")
    return rows


if __name__ == "__main__":
    main()
