#!/bin/bash
# r4 queue 11 — validate the batched-head default flip (queue10: ViT-B b88
# 950.38 vs 896.4 loop, EVA02-B b64 816.68 vs 754.21):
#  1. smoke_learn with the new default (learnability R@1 on-chip)
#  2. one default `python bench.py` — the exact program the driver runs at
#     round end; confirms the 950 point reproduces via the warm cache.
cd /root/repo
LOG=tools/r4_bench.log

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q11) ===" >> "$LOG"
    sleep 180
  done
}

wait_tunnel
echo "=== Q11 smoke_learn fusedp(batched default) $(date +%H:%M:%S) ===" >> "$LOG"
timeout 3600 python tools/smoke_learn.py --precision bf16 --attn-impl fusedp --gelu-approx >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

wait_tunnel
echo "=== Q11 default bench (batched default) $(date +%H:%M:%S) ===" >> "$LOG"
MRCLIP_BENCH_ATTEMPTS=1 timeout 4200 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"
echo "QUEUE11 DONE $(date +%H:%M:%S)" >> "$LOG"
