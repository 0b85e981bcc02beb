#!/bin/bash
# ViT-L-14 unrolled experiment (r3): unrolled layers beat lax.scan by ~38%
# on ViT-B-16 (XLA fuses across block boundaries) but create_model
# auto-unrolls only <=16-layer stacks, so L-14 (24 layers) has always run
# scanned. Test --no-scan (+remat, which L-14 needs to fit at b16).
# Tunnel compile for unrolled B-16 is 8-15 min; L-14 may take 30-60 min.
set -x
cd /root/repo
LOG=tools/r3_l14_unroll.log
for args in \
  "--batch-size 16 --remat --no-scan" \
  "--batch-size 20 --remat --no-scan" \
  ; do
  echo "=== ViT-L-14 $args $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 5400 python bench.py --model ViT-L-14 --precision pure_bf16 \
    $args >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
done
echo "UNROLL SWEEP DONE" >> "$LOG"
