#!/bin/bash
# EVA01-g single-chip train: b12 remat OOM'd; try smaller batches with
# adafactor (factored 2nd moment) + full remat.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model EVA01-g-14 --precision pure_bf16 --batch-size 8 --remat --remat-policy full --opt adafactor
run --model EVA02-B-16 --batch-size 48 --gelu-approx
run --model EVA02-B-16 --batch-size 64 --gelu-approx
echo "BIG MODELS 5 DONE" >> "$LOG"
