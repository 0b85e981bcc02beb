#!/bin/bash
# Loss-objective on-chip points at the r3 default config (ViT-B-16 b88
# attn-bf16 + bf16-mu + tanh): SigLIP sigmoid and plain InfoNCE vs the
# multipositive default, plus a SigLIP-arch SO400M sanity batch sweep point.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
until grep -q "BIG MODELS 9 DONE" "$LOG"; do sleep 60; done
run() {
  echo "=== R10 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --loss siglip
run --loss clip
echo "BIG MODELS 10 DONE" >> "$LOG"
