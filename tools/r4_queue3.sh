#!/bin/bash
# r4 queue 3 — gated on queue2's log marker (not a pid file: r3 advisor
# flagged pid-file gating as racy). Runs after the EVA02 trace lands:
#  - EVA02-B-16 under fusedp: same 197-token sequence as ViT-B-16 where
#    fusedp won +3.3%, and EVA02's attention is HBM-bound (r3 trace) —
#    scores-in-VMEM attacks exactly those bytes.
#  - serving surface under fusedp (encode_image b256 / b8).
cd /root/repo
LOG=tools/r4_bench.log
echo $$ > /tmp/r4_queue3.pid

until grep -q "QUEUE2 DONE" "$LOG"; do sleep 60; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q3) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q3 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
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

run --model EVA02-B-16 --batch-size 64 --attn-impl fusedp
run --infer --batch-size 256 --attn-impl fusedp
run --infer --batch-size 8 --attn-impl fusedp
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
