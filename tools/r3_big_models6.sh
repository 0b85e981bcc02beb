#!/bin/bash
# CLEAN re-runs: two sweep-4 copies overlapped on the exclusive chip from
# 18:09-18:47, contaminating the H-14/EVA01-g adafactor numbers and the
# flagship confirm. Re-measure solo.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== CLEAN $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model ViT-H-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model ViT-H-14 --precision pure_bf16 --batch-size 24 --remat --opt adafactor
run --model EVA01-g-14 --precision pure_bf16 --batch-size 12 --remat --opt adafactor
run --model EVA02-B-16 --batch-size 48 --gelu-approx
run --model EVA02-B-16 --batch-size 64 --gelu-approx
run
echo "BIG MODELS 6 DONE" >> "$LOG"
