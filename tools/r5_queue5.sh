#!/bin/bash
# r5 queue 5: Pallas depthwise-conv on-chip A/B at the S1 b128 operating
# point (XLA-dw control measured 1020.0 same night), then S2 with the
# winning impl.
set -u
cd /root/repo
LOG=tools/r5_bench.log
run() {
  echo "=== R5Q5 [$1] ${@:2} $(date +%H:%M:%S) ===" >> "$LOG"
  MRCLIP_DW_IMPL=$1 python bench.py "${@:2}" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run pallas --model MobileCLIP-S1 --batch-size 128
echo "R5QUEUE5 DONE $(date +%H:%M:%S)" >> "$LOG"
