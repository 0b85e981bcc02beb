#!/usr/bin/env bash
# Round-2 sweep 6: bf16 score-tensor attention (attn_impl=bf16) — halves the
# [B,H,197,197] fp32 HBM traffic the r1 trace showed dominating attention.
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

run() {
  local tag="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $tag : $*" >> "$LOG"
  out=$(timeout 3600 python bench.py "$@" 2>>"$LOG")
  rc=$?
  echo "=== $(date -u +%H:%M:%S) END $tag rc=$rc" >> "$LOG"
  if [ -n "$out" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $out}" >> "$RES"
  else
    echo "{\"tag\": \"$tag\", \"result\": null, \"rc\": $rc}" >> "$RES"
  fi
}

run b80_attnbf16 --batch-size 80 --attn-impl bf16
run b96_attnbf16 --batch-size 96 --attn-impl bf16
run b112_attnbf16 --batch-size 112 --attn-impl bf16
echo "=== $(date -u +%H:%M:%S) SWEEP6 DONE" >> "$LOG"
