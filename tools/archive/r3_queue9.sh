#!/bin/bash
# Ninth r3 TPU queue: runs after queue7 (waits on its pid). Points carried
# over from the originally-planned queue7/queue8 scripts:
#  - chunked CoCa captioning CE throughput+memory (dense b128 OOMs)
#  - EVA02 confirms after the rope compute-dtype change (8560a3a)
cd /root/repo
LOG=tools/r3_big_models.log

while [ -e /proc/$(cat /tmp/queue7.pid 2>/dev/null || echo 0) ]; do sleep 60; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q9) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q9 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

run1() {
  wait_tunnel
  echo "=== Q9 $* [try 1/1] $(date +%H:%M:%S) ===" >> "$LOG"
  MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOG"
  return $rc
}

# Chunked == dense numerics is CPU-tested; these measure throughput + memory.
run1 --model coca_ViT-B-32 --batch-size 96 --loss-impl chunked
if run1 --model coca_ViT-B-32 --batch-size 128 --loss-impl chunked; then
  run1 --model coca_ViT-B-32 --batch-size 192 --loss-impl chunked
fi
# EVA02 after the compute-dtype rope rotation (HBM-bound attn: fewer bytes).
run --model EVA02-B-16 --batch-size 64
run1 --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
echo "QUEUE9 DONE $(date +%H:%M:%S)" >> "$LOG"
