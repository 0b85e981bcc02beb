#!/usr/bin/env bash
# Round-2 sweep 15: batch scaling for the small families (B-32 is MLP-bound
# with 50-token sequences; RN50 conv-bound — both may want larger batches).
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

run B32_b384 --model ViT-B-32 --batch-size 384 --steps 30
run RN50_b192 --model RN50 --batch-size 192 --steps 30
echo "=== $(date -u +%H:%M:%S) SWEEP15 DONE" >> "$LOG"
