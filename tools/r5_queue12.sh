#!/bin/bash
# r5 queue 12: final-HEAD headline confirm (6th cold driver-equivalent run).
set -u
cd /root/repo
LOG=tools/r5_bench.log
echo "=== R5Q12 final-HEAD default confirm $(date +%H:%M:%S) ===" >> "$LOG"
python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "R5QUEUE12 DONE $(date +%H:%M:%S)" >> "$LOG"
