#!/usr/bin/env bash
# Round-2 sweep 4: manual (bf16-probs) attention + fwd-only flash diagnosis.
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep.pid /tmp/r2_sweep2.pid /tmp/r2_sweep3.pid; do
  if [ -f "$pidf" ]; then
    while kill -0 "$(cat $pidf)" 2>/dev/null; do sleep 60; done
  fi
done

run() {
  local tag="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $tag : $*" >> "$LOG"
  out=$(timeout 3000 python bench.py "$@" 2>>"$LOG")
  rc=$?
  echo "=== $(date -u +%H:%M:%S) END $tag rc=$rc" >> "$LOG"
  if [ -n "$out" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $out}" >> "$RES"
  else
    echo "{\"tag\": \"$tag\", \"result\": null, \"rc\": $rc}" >> "$RES"
  fi
}

# bf16-probs manual attention: halves the HBM score-matrix traffic
run b80_manual --mfu --attn-impl manual --trace /root/repo/profiles/b80_manual
run b96_manual --mfu --batch-size 96 --attn-impl manual
# fwd-only: isolate whether the flash kernel itself is slow at ViT shapes
run infer_xla   --infer
run infer_flash --infer --attn-impl flash
echo "=== $(date -u +%H:%M:%S) SWEEP4 DONE" >> "$LOG"
