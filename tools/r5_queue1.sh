#!/bin/bash
# r5 queue 1: headline reproducibility (VERDICT r4 item 1).
# Three consecutive driver-equivalent cold invocations of the default bench
# (fresh shell, no special env, plain `python bench.py`), logging to
# tools/r5_bench.log. Each prints per-window values + the chained
# steady-state value + an environment fingerprint (bench.py r5).
set -u
cd /root/repo
LOG=tools/r5_bench.log
for i in 1 2 3; do
  echo "=== R5Q1 cold bench run $i/3 $(date +%H:%M:%S) ===" >> "$LOG"
  python bench.py >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
done
echo "R5QUEUE1 DONE $(date +%H:%M:%S)" >> "$LOG"
