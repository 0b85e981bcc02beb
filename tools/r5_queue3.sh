#!/bin/bash
# r5 queue 3: delta-pre A/B + re-benches.
#  a) default b88 with MRCLIP_FUSEDP_DELTA=pre (A/B vs the 957.6/957.5/957.1
#     r5 baseline; the bwd kernel drops its o operand + in-VMEM delta)
#  b) EVA02-B-16 b64 fusedp delta-pre (baseline 816.68)
#  c) ViTamin-L re-bench on the param-anchored stage table (r4's 195.81 was
#     measured on the oversized 397M model)
#  d) MobileCLIP-S1 b128 trace fallback (b256 + profiler OOMed in q2)
set -u
cd /root/repo
LOG=tools/r5_bench.log
run() {
  echo "=== R5Q3 $* $(date +%H:%M:%S) ===" >> "$LOG"
  python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --batch-size 88
run --model EVA02-B-16 --batch-size 64
run --model ViTamin-L --batch-size 16 --remat --precision pure_bf16 --opt adafactor
if ! ls profiles/r5_mcs1/plugins/profile/*/perfetto_trace.json.gz >/dev/null 2>&1; then
  run --model MobileCLIP-S1 --batch-size 128 --trace profiles/r5_mcs1_b128
fi
echo "R5QUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
