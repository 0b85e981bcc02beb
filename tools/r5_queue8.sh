#!/bin/bash
# r5 queue 8: MobileCLIP-S2 at b96 (b128 OOMs — S2's 80-640 dims carry
# ~1.7x S1's activations).
set -u
cd /root/repo
LOG=tools/r5_bench.log
echo "=== R5Q8 --model MobileCLIP-S2 --batch-size 96 $(date +%H:%M:%S) ===" >> "$LOG"
python bench.py --model MobileCLIP-S2 --batch-size 96 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "R5QUEUE8 DONE $(date +%H:%M:%S)" >> "$LOG"
