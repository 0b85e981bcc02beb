#!/bin/bash
# r5 queue 7: per-step dispatch A/B. The r5 trace shows the fused-scan
# carry COPYING the optimizer state every iteration (0.43s/window = ~4.4%
# of device time, copy ops named state_opt_state_0__nu__*); --no-fused
# dispatches steps individually with donate_argnums so XLA updates the
# train state in place. Whether it wins depends on the tunnel's per-step
# dispatch pipelining.
set -u
cd /root/repo
LOG=tools/r5_bench.log
echo "=== R5Q7 --no-fused --batch-size 88 $(date +%H:%M:%S) ===" >> "$LOG"
python bench.py --no-fused --batch-size 88 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "R5QUEUE7 DONE $(date +%H:%M:%S)" >> "$LOG"
