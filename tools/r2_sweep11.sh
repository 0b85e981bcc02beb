#!/usr/bin/env bash
# Round-2 sweep 11: small-batch serving latency — int8 weights halve the
# weight HBM traffic that dominates at low batch (weight-bound regime).
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep10.pid; do
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

run infer_b8_bf16 --infer --batch-size 8
run infer_b8_int8 --infer --batch-size 8 --int8
echo "=== $(date -u +%H:%M:%S) SWEEP11 DONE" >> "$LOG"
