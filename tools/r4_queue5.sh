#!/bin/bash
# r4 queue 5 — new-family train points + leaner chunked CE:
#  1. coca b96 chunked rerun (logsumexp-only CE may beat r3's 920.97)
#  2. ViTamin-L b32 (new native hybrid; fallback to b16 remat on OOM)
#  3. MobileCLIP-S1 b256 (conv-heavy small tower)
#  4. MobileCLIP-B b64 (hybrid ViT)
# bench.py holds the chip flock, so any concurrent process serializes.
cd /root/repo
LOG=tools/r4_bench.log

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
    if tail -40 "$LOG" | grep -qE "RESOURCE_EXHAUSTED|ResourceExhausted|Out of memory"; then
      echo "(deterministic OOM — not retrying)" >> "$LOG"
      return $rc
    fi
  done
  return 1
}

run --model coca_ViT-B-32 --batch-size 96 --loss-impl chunked
run --model ViTamin-L --batch-size 32 || \
  run --model ViTamin-L --batch-size 16 --remat --precision pure_bf16 --opt adafactor
run --model MobileCLIP-S1 --batch-size 256 || \
  run --model MobileCLIP-S1 --batch-size 128
run --model MobileCLIP-B --batch-size 64
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> "$LOG"
