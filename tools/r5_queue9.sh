#!/bin/bash
# r5 queue 9: MobileCLIP-S2 at b64 (b128 and b96 both OOM the 15.75G chip
# at 256px — S2's 80-640 stage dims).
set -u
cd /root/repo
LOG=tools/r5_bench.log
echo "=== R5Q9 --model MobileCLIP-S2 --batch-size 64 $(date +%H:%M:%S) ===" >> "$LOG"
python bench.py --model MobileCLIP-S2 --batch-size 64 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "R5QUEUE9 DONE $(date +%H:%M:%S)" >> "$LOG"
