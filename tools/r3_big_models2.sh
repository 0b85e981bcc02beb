#!/bin/bash
# Big-model retries: H-14/EVA01-g OOM'd with remat(dots) at b8 on the
# 15.75G chip (fp32 Adam nu for ~1B params dominates). Try the cheapest
# memory policies and smaller batches; a 1B-param train step may simply
# need fsdp across chips (the dryrun covers that path) — either result is
# recorded honestly.
set -x
cd /root/repo
LOG=tools/r3_big_models.log
run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$LOG"
  timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model ViT-H-14 --precision pure_bf16 --batch-size 8 --remat --remat-policy full
run --model ViT-H-14 --precision pure_bf16 --batch-size 4 --remat --remat-policy full
run --model EVA01-g-14 --precision pure_bf16 --batch-size 4 --remat --remat-policy full
run --model convnext_large_d --precision bf16 --batch-size 16 --remat
run --model convnext_large_d --precision bf16 --batch-size 24 --remat
echo "BIG MODELS 2 DONE" >> "$LOG"
