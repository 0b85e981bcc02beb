#!/usr/bin/env bash
# Round-2 sweep 7: int8 W8A8 quantized serving throughput (after sweep6).
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep6.pid; do
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

run infer_int8_b256 --infer --int8 --batch-size 256
run infer_int8_b512 --infer --int8 --batch-size 512
echo "=== $(date -u +%H:%M:%S) SWEEP7 DONE" >> "$LOG"
