#!/bin/bash
# Retry points that failed on the tunnel outage (Connection refused), plus
# an EVA02-L unrolled check.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== R8 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model EVA02-B-16 --infer --batch-size 256
echo "BIG MODELS 8 DONE" >> "$LOG"
