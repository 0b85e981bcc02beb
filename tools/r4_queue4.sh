#!/bin/bash
# r4 queue 4 — post-lock-wiring measurements:
#  1. headline default bench (cache-warm confirm after acquire_chip_lock
#     wiring; program unchanged -> compile-cache hit, ~10 min)
#  2. EVA02-B-16 fusedp trace (the "after" per-op MXU table; the bf16
#     "before" is profiles/r4_eva02 at 608 pairs/s)
#  3. coca chunked b128 retest: logsumexp CE (no second [B,C,V] logp) +
#     batch-scaled caption chunk (12 at b128) — r4's earlier b128 OOM was
#     measured clean, this is the fix attempt
#  4. coca chunked b192 (only meaningful if b128 passes; run guards OOM)
# bench.py now flocks /tmp/mrclip_tpu_chip.lock, so even a stray concurrent
# process serializes instead of corrupting the measurement.
cd /root/repo
LOG=tools/r4_bench.log

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q4) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q4 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
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

run
run --model EVA02-B-16 --batch-size 64 --trace profiles/r4_eva02_fusedp
run --model coca_ViT-B-32 --batch-size 128 --loss-impl chunked && \
  run --model coca_ViT-B-32 --batch-size 192 --loss-impl chunked
echo "QUEUE4 DONE $(date +%H:%M:%S)" >> "$LOG"
