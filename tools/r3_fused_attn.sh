#!/bin/bash
# Priority measurements after R9: the new single-tile fused attention kernel
# (ops/fused_attn.py) at the r3 default config, plus larger batches (score
# tensors no longer materialize in HBM -> more headroom), then the retry of
# the tunnel-outage infer point and the loss-objective points.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
until grep -q "BIG MODELS 9 DONE" "$LOG"; do sleep 60; done
run() {
  echo "=== R10 $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --attn-impl fused
run --attn-impl fused --batch-size 128
run --attn-impl fused --batch-size 160
run --model EVA02-B-16 --infer --batch-size 256
run --loss siglip
run --loss clip
echo "BIG MODELS 10 DONE" >> "$LOG"
