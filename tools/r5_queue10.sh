#!/bin/bash
# r5 queue 10: does fusedp pay at ViT-B-32's 50-token sequences?
# (bf16-attn control: 2058 at b256, r3)
set -u
cd /root/repo
LOG=tools/r5_bench.log
echo "=== R5Q10 --model ViT-B-32 --batch-size 256 --attn-impl fusedp $(date +%H:%M:%S) ===" >> "$LOG"
python bench.py --model ViT-B-32 --batch-size 256 --attn-impl fusedp >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "R5QUEUE10 DONE $(date +%H:%M:%S)" >> "$LOG"
