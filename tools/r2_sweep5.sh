#!/usr/bin/env bash
# Round-2 sweep 5: ViT-L-14 single-chip configs (bf16 Adam mu buys HBM room).
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep4.pid; do
  if [ -f "$pidf" ]; then
    while kill -0 "$(cat $pidf)" 2>/dev/null; do sleep 60; done
  fi
done

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

run L14_b24_bf16mu --model ViT-L-14 --batch-size 24 --remat --precision pure_bf16 --bf16-moments --steps 30
run L14_b16_bf16mu --model ViT-L-14 --batch-size 16 --remat --precision pure_bf16 --bf16-moments --steps 30
echo "=== $(date -u +%H:%M:%S) SWEEP5 DONE" >> "$LOG"
