#!/bin/bash
# r5 queue 2: traces + stragglers.
#  a) device trace of the 957-pairs/s default config (find the current
#     limiter now that batched fusedp removed the old ones)
#  b) MobileCLIP-S1 b256 train trace (VERDICT item 4: S1 at 849 pairs/s for
#     a tiny tower is unexamined — find the dominant non-roofline op)
#  c) --attn-impl fused b88 on-chip confirm (ADVICE item 3: zero successful
#     TPU executions after the Mosaic-legality fix)
set -u
cd /root/repo
LOG=tools/r5_bench.log
run() {
  echo "=== R5Q2 $* $(date +%H:%M:%S) ===" >> "$LOG"
  python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --trace profiles/r5_default
run --model MobileCLIP-S1 --batch-size 256 --trace profiles/r5_mcs1
run --attn-impl fused --batch-size 88
echo "R5QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
