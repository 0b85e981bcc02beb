#!/bin/bash
# Big-model TRAIN steps with adafactor (r3): Adam's fp32 nu alone is ~4GB
# for ~1B params, which is why H-14/EVA01-g train OOM'd at any batch;
# adafactor's factored second moment is ~KBs. big_vision trains these
# exact shapes this way on TPU.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model ViT-H-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model ViT-H-14 --precision pure_bf16 --batch-size 24 --remat --opt adafactor
run --model EVA01-g-14 --precision pure_bf16 --batch-size 12 --remat --opt adafactor
# final flagship confirmation on an otherwise-idle chip
run
echo "BIG MODELS 4 DONE" >> "$LOG"
