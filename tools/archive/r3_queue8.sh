#!/bin/bash
# Eighth r3 TPU queue: bf16-rope A/B on EVA02-B (prior rows: 578 fp32-rope
# slice+concat -> 603 fp32-rope identity-prefix; this measures rotating in
# compute dtype under attn-impl bf16 — the trace shows visual attn at
# 100-116% HBM BW where fp32 rope intermediates are pure byte overhead).
cd /root/repo
LOG=tools/r3_big_models.log

until grep -q "QUEUE7 DONE" "$LOG"; do sleep 120; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q8) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q8 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

run --model EVA02-B-16 --batch-size 64
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
echo "QUEUE8 DONE" >> "$LOG"
