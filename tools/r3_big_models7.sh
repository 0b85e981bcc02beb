#!/bin/bash
# EVA01-g last-chance single-chip train points (b12 remat-dots OOM'd solo):
# full remat + smaller batch; then EVA02-L operating point.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== CLEAN $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model EVA01-g-14 --precision pure_bf16 --batch-size 8 --remat --remat-policy full --opt adafactor
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model EVA02-B-16 --infer --batch-size 256
echo "BIG MODELS 7 DONE" >> "$LOG"
