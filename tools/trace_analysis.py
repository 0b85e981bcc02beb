"""Aggregate a jax.profiler perfetto trace into a per-subsystem time table.

Usage: python tools/trace_analysis.py <perfetto_trace.json.gz> [--top N]

Groups device-side XLA op spans (the '/device:TPU:0' 'XLA Ops' thread) by
the model component extracted from their `tf_op` annotation (visual/text
tower x attn/mlp/other, loss, optimizer, H2D copies) and prints busy time,
share, and the top individual fusions. This is the trace-backed view behind
the MFU numbers in CLAUDE.md.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re


def categorize(tf_op: str, name: str) -> str:
    t = tf_op or name
    if "copy" in name and not t:
        return "copy/h2d"
    tower = "visual" if "visual" in t else ("text" if ".text/" in t or "/text/" in t else "")
    if "optax" in t or re.search(r"closed_call/(add|sub|mul|div)", t):
        return "optimizer"
    if any(k in t for k in ("mlp/", "c_fc", "c_proj")):
        return f"{tower or 'model'}/mlp"
    if any(k in t for k in ("attn", "in_proj", "out_proj", "dot_product", "softmax")):
        return f"{tower or 'model'}/attn"
    if any(k in t for k in ("ln_", "layer_norm", "LayerNorm")):
        return f"{tower or 'model'}/layernorm"
    if "conv1" in t or "convolution" in name:
        return "visual/patchify"
    if "token_embedding" in t or "embedding" in t:
        return "text/embed"
    if any(k in t for k in ("loss", "log_softmax", "logits", "pos_mask")):
        return "loss"
    if tower:
        return f"{tower}/other"
    if "while" in name:
        return "_while_wrapper"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    with gzip.open(args.trace) as f:
        data = json.load(f)
    ev = data if isinstance(data, list) else data.get("traceEvents", [])

    # device pid: process named /device:TPU:* (fall back to cpu device)
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device:" in str(e.get("args", {}).get("name", ""))
    }
    op_tids = {
        (e["pid"], e["tid"]) for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Ops" and e["pid"] in dev_pids
    }
    ops = [
        e for e in ev
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids
    ]
    if not ops:
        raise SystemExit("no device XLA op spans found in trace")

    window = (max(e["ts"] + e["dur"] for e in ops) - min(e["ts"] for e in ops)) / 1e6
    cats = collections.Counter()
    per_op = collections.Counter()
    op_meta = {}
    for e in ops:
        tf_op = (e.get("args") or {}).get("tf_op", "")
        c = categorize(tf_op, e["name"])
        if c == "_while_wrapper":
            continue  # wrapper double-counts its children
        cats[c] += e["dur"]
        key = re.sub(r"\.\d+$", "", e["name"]) + " | " + tf_op[:80]
        per_op[key] += e["dur"]
        op_meta[key] = tf_op
    total = sum(cats.values())

    print(f"device window: {window:.3f}s   op busy: {total/1e6:.3f}s   busy frac: {total/1e6/window:.3f}")
    print("\n== by subsystem ==")
    for c, d in cats.most_common():
        print(f"{d/1e6:9.3f}s {100*d/total:5.1f}%  {c}")
    print(f"\n== top {args.top} ops ==")
    for k, d in per_op.most_common(args.top):
        print(f"{d/1e6:9.3f}s {100*d/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
