#!/bin/bash
# Round-out after R10: EVA02-L retry (3x tunnel-outage victim), fused-attn
# serving point, and a trace of the best fused config for the MXU table.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
until grep -q "BIG MODELS 10 DONE" "$LOG"; do sleep 60; done
run() {
  echo "=== R11 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --infer --attn-impl fused --batch-size 256
run --attn-impl fused --trace profiles/r3_fused
echo "BIG MODELS 11 DONE" >> "$LOG"
