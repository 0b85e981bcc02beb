#!/bin/bash
# Big-model serving numbers (r3): H-14/EVA01-g train steps cannot fit on
# one 15.75G chip (≈10GB Adam state for ~1B params — the fsdp case, proven
# on the virtual mesh in test_scale_execution/dryrun). Forward-only
# inference needs only bf16 params (~2GB) and is the realistic single-chip
# role for these models.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model ViT-H-14 --infer --batch-size 64
run --model EVA01-g-14 --infer --batch-size 32
run --model convnext_large_d --infer --batch-size 64
echo "BIG MODELS 3 DONE" >> "$LOG"
