#!/bin/bash
# Third follow-up TPU queue (after tools/r3_queue2.sh prints QUEUE2 DONE).
# Same robust probing as r3_queue.sh: the tunnel flaps, probe before each
# point and retry once. One point at a time — the chip is exclusive.
cd /root/repo
LOG=tools/r3_big_models.log

until grep -q "QUEUE2 DONE" "$LOG"; do sleep 300; done

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
  done
  return 1
}

# The Pallas streaming loss has only ever run interpreted (CPU tests) —
# first real-kernel run on the chip: correctness (loss printed) + perf.
run --loss-impl pallas
run --loss-impl chunked
echo "QUEUE3 DONE" >> "$LOG"
