#!/bin/bash
# ViT-L-14 operating-point sweep on the real chip (r3): batch sizes around
# the recorded b16 remat(dots) pure_bf16 point, plus no-remat / mlp_only
# at b16 to test whether remat still pays at L-14 scale with tanh-GELU.
# Serialized: the chip is exclusive. Appends one JSON line per run.
set -x
cd /root/repo
LOG=tools/r3_l14_sweep.log
for args in \
  "--batch-size 20 --remat" \
  "--batch-size 24 --remat" \
  "--batch-size 16" \
  "--batch-size 16 --remat --remat-policy mlp_only" \
  ; do
  echo "=== ViT-L-14 $args $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4200 python bench.py --model ViT-L-14 --precision pure_bf16 \
    $args >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
done
echo "SWEEP DONE" >> "$LOG"
