#!/bin/bash
# Follow-up TPU points after tools/r3_queue.sh finishes (waits for its
# QUEUE DONE marker). Same robust probing: the tunnel flaps, so probe
# before each point and retry once. One point at a time — chip exclusive.
cd /root/repo
LOG=tools/r3_big_models.log

until grep -q "QUEUE DONE" "$LOG"; do sleep 300; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q2) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q2 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    # bench.py has its own in-process retry now; keep queue-level control.
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# CoCa is the one model family without a measured on-chip train row.
run --model coca_ViT-B-32 --batch-size 128
# Fused attention on the 257-token ViT-L (pads 257->384; biggest win if the
# B-16 fusedp point landed).
run --model ViT-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor --attn-impl fusedp
run --model coca_ViT-B-32 --batch-size 192
echo "QUEUE2 DONE" >> "$LOG"
