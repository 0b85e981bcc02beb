#!/usr/bin/env bash
# Round-2 sweep 14: progression-config datapoints (BASELINE.md configs 1-2):
# ViT-B-32 and RN50 multipositive train throughput under the perf defaults.
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

run B32_b256 --model ViT-B-32 --batch-size 256
run RN50_b128 --model RN50 --batch-size 128 --steps 30
echo "=== $(date -u +%H:%M:%S) SWEEP14 DONE" >> "$LOG"
