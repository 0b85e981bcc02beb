#!/bin/bash
# Fifth r3 TPU queue: EVA02 perf investigation. Waits for QUEUE4 DONE.
# EVA02-B-16 trains at 36% MFU vs plain B/16's 56% on ~4% FEWER flops/pair
# — all overhead (rope/SwiGLU sub-LN/inner-LN). Get a trace, and A/B the
# identity-prefix rope rewrite (models/layers.py::apply_rope_cat).
cd /root/repo
LOG=tools/r3_big_models.log

until grep -q "QUEUE4 DONE" "$LOG"; do sleep 120; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q5) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q5 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# A/B: EVA02-B-16 train with the identity-prefix rope (prior row: 578).
run --model EVA02-B-16 --batch-size 64
# Trace for the per-op MXU/BW table (tools/mxu_table.py).
run --model EVA02-B-16 --batch-size 64 --trace profiles/r3_eva02
echo "QUEUE5 DONE" >> "$LOG"
