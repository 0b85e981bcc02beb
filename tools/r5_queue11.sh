#!/bin/bash
# r5 queue 11: fusedp on CoCa (50-token vision + 76-token causal decoder +
# cross-attention — the short-sequence regime where fusedp just won +9% on
# ViT-B-32). Control: 1008 at b96 dense (r3).
set -u
cd /root/repo
LOG=tools/r5_bench.log
echo "=== R5Q11 --model coca_ViT-B-32 --batch-size 96 --attn-impl fusedp $(date +%H:%M:%S) ===" >> "$LOG"
python bench.py --model coca_ViT-B-32 --batch-size 96 --attn-impl fusedp >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "R5QUEUE11 DONE $(date +%H:%M:%S)" >> "$LOG"
