#!/bin/bash
# ViT-L-14 unrolled refinement: unrolled+remat(dots) b16 won at 228.2
# (vs 193 scanned). Probe the remat policy and smaller batch around it.
set -x
cd /root/repo
LOG=tools/r3_l14_unroll.log
for args in \
  "--batch-size 16 --remat --remat-policy mlp_only --no-scan" \
  "--batch-size 12 --remat --no-scan" \
  ; do
  echo "=== ViT-L-14 $args $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 5400 python bench.py --model ViT-L-14 --precision pure_bf16 \
    $args >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
done
echo "UNROLL2 SWEEP DONE" >> "$LOG"
