#!/usr/bin/env bash
# Round-2 sweep 13: b80 vs b84 vs b88 tie-breaker under the default config
# (attn bf16 + bf16 mu) to pick the default batch.
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep12.pid; do
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

run b84_attnbf16_mu --batch-size 84
run b88_attnbf16_mu_r2 --batch-size 88
run b80_attnbf16_mu_r2 --batch-size 80
echo "=== $(date -u +%H:%M:%S) SWEEP13 DONE" >> "$LOG"
