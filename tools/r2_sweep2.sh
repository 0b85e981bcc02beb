#!/usr/bin/env bash
# Round-2 sweep, part 2: flash-attention configs. Waits for sweep 1 (the
# chip is exclusive), then appends to the same results file.
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

if [ -f /tmp/r2_sweep.pid ]; then
  while kill -0 "$(cat /tmp/r2_sweep.pid)" 2>/dev/null; do sleep 60; done
fi

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

# Flash attention: kills the HBM score-matrix traffic (41% of device time)
run b80_flash --attn-impl flash --trace /root/repo/profiles/b80_flash
# flash also frees the fwd-saved score matrices -> batch headroom, no remat
run b96_flash  --batch-size 96  --attn-impl flash
run b128_flash --batch-size 128 --attn-impl flash
echo "=== $(date -u +%H:%M:%S) SWEEP2 DONE" >> "$LOG"
