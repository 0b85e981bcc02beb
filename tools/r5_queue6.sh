#!/bin/bash
# r5 queue 6: final confirms at round HEAD — default headline (delta default
# restored to in-kernel == the 957 program), EVA02-B confirm, and
# MobileCLIP-S2 at the corrected b128-style operating point.
set -u
cd /root/repo
LOG=tools/r5_bench.log
run() {
  echo "=== R5Q6 $* $(date +%H:%M:%S) ===" >> "$LOG"
  python bench.py "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}
run
run --model EVA02-B-16 --batch-size 64
run --model MobileCLIP-S2 --batch-size 128
echo "R5QUEUE6 DONE $(date +%H:%M:%S)" >> "$LOG"
