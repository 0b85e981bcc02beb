#!/bin/bash
# r4 queue 2 — resumes r4_queue1.sh after the 08/20 00:20 VM reboot killed
# it mid-sweep (b88=891.97 and b84=893.58 landed; b92 did not).
# Remaining VERDICT r3 items 3/4/6 groundwork:
#  - fusedp b92 (last sweep point for the adopt-as-default gate)
#  - clean CoCa chunked b128/b192 retest (r3 OOM was chip contention)
#  - EVA02-B-16 per-op device trace for the rope/SwiGLU attack
# bench.py itself takes the exclusive-chip flock; this script just
# serializes jobs and records a pid for liveness checks.
cd /root/repo
LOG=tools/r4_bench.log
echo $$ > /tmp/r4_queue2.pid

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q2) ===" >> "$LOG"
    sleep 180
  done
}

# Retry once on tunnel/timeout flakes, but never on deterministic failures
# (RESOURCE_EXHAUSTED/OOM) — a retry is another 10+ min tunnel compile for
# a config that cannot succeed (r3 advisor finding).
run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q2 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    if tail -40 "$LOG" | grep -qE "RESOURCE_EXHAUSTED|ResourceExhausted|Out of memory"; then
      echo "(deterministic OOM — not retrying)" >> "$LOG"
      return $rc
    fi
  done
  return 1
}

# 1. last fusedp sweep point (q1 got b88/b84 before the reboot).
run --attn-impl fusedp --batch-size 92
# 2. CoCa chunked-loss memory ceiling, clean chip this time.
if run --model coca_ViT-B-32 --batch-size 128 --loss-impl chunked; then
  run --model coca_ViT-B-32 --batch-size 192 --loss-impl chunked
fi
# 3. EVA02-B-16 per-op trace (tools/mxu_table.py input for the rope work).
run --model EVA02-B-16 --batch-size 64 --trace profiles/r4_eva02
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
