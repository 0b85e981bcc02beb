#!/usr/bin/env bash
# Round-2 sweep 3: flash attention with the remat-wrapped kernel (the
# unwrapped custom-vjp residuals OOM'd b80 in sweep 2).
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep.pid /tmp/r2_sweep2.pid; do
  if [ -f "$pidf" ]; then
    while kill -0 "$(cat $pidf)" 2>/dev/null; do sleep 60; done
  fi
done

run() {
  local tag="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $tag : $*" >> "$LOG"
  out=$(timeout 3000 python bench.py --mfu "$@" 2>>"$LOG")
  rc=$?
  echo "=== $(date -u +%H:%M:%S) END $tag rc=$rc" >> "$LOG"
  if [ -n "$out" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $out}" >> "$RES"
  else
    echo "{\"tag\": \"$tag\", \"result\": null, \"rc\": $rc}" >> "$RES"
  fi
}

run b80_flash_r --attn-impl flash --trace /root/repo/profiles/b80_flash
run b96_flash_r  --batch-size 96  --attn-impl flash
run b128_flash_r --batch-size 128 --attn-impl flash
echo "=== $(date -u +%H:%M:%S) SWEEP3 DONE" >> "$LOG"
