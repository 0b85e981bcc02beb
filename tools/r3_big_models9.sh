#!/bin/bash
# Wait for script 8, then: EVA02-L retry (tunnel outage x2), SigLIP SO400M
# train point, default-config confirm after the r3 review fixes, and
# single-chip giant points (ViT-g-14, ViT-bigG-14).
set -x
cd /root/repo
LOG=tools/r3_big_models.log
until grep -q "BIG MODELS 8 DONE" "$LOG"; do sleep 60; done
run() {
  echo "=== R9 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run
run --model ViT-SO400M-14-SigLIP --precision pure_bf16 --batch-size 16 --remat --opt adafactor --gelu-approx
run --model ViT-g-14 --precision pure_bf16 --batch-size 8 --remat --remat-policy full --opt adafactor --gelu-approx
run --model ViT-bigG-14 --precision pure_bf16 --batch-size 4 --remat --remat-policy full --opt adafactor --gelu-approx
echo "BIG MODELS 9 DONE" >> "$LOG"
