#!/bin/bash
# r5 queue 4: MobileCLIP-S1 operating-point sweep (b128 measured 1020 vs
# b256's 849 — find the peak).
set -u
cd /root/repo
LOG=tools/r5_bench.log
run() {
  echo "=== R5Q4 $* $(date +%H:%M:%S) ===" >> "$LOG"
  MRCLIP_DW_IMPL=xla python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run --model MobileCLIP-S1 --batch-size 96
run --model MobileCLIP-S1 --batch-size 192
run --model MobileCLIP-S1 --batch-size 64
echo "R5QUEUE4 DONE $(date +%H:%M:%S)" >> "$LOG"
