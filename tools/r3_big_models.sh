#!/bin/bash
# Big-model throughput points (r3): the registry now carries H-14, EVA01-g,
# and convnext_large_d — measure real train-step numbers for the perf table.
# All scanned stacks (>24 layers) except convnext; remat for the big ViTs.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model ViT-H-14 --precision pure_bf16 --batch-size 8 --remat
run --model ViT-H-14 --precision pure_bf16 --batch-size 12 --remat
run --model EVA01-g-14 --precision pure_bf16 --batch-size 8 --remat
run --model convnext_large_d --precision bf16 --batch-size 32
run --model convnext_large_d --precision bf16 --batch-size 48 --remat
echo "BIG MODELS DONE" >> "$LOG"
