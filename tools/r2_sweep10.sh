#!/usr/bin/env bash
# Round-2 sweep 10: device trace + exact-MFU of the final default config.
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep9.pid; do
  if [ -f "$pidf" ]; then
    while kill -0 "$(cat $pidf)" 2>/dev/null; do sleep 60; done
  fi
done

echo "=== $(date -u +%H:%M:%S) START trace_default_r2" >> "$LOG"
out=$(timeout 3600 python bench.py --trace profiles/r2_default --mfu 2>>"$LOG")
rc=$?
echo "=== $(date -u +%H:%M:%S) END trace_default_r2 rc=$rc" >> "$LOG"
if [ -n "$out" ]; then
  echo "{\"tag\": \"trace_default_r2\", \"result\": $out}" >> "$RES"
else
  echo "{\"tag\": \"trace_default_r2\", \"result\": null, \"rc\": $rc}" >> "$RES"
fi
echo "=== $(date -u +%H:%M:%S) SWEEP10 DONE" >> "$LOG"
