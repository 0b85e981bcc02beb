#!/bin/bash
# Sixth r3 TPU queue: replaces the tail of queue4 + queue5 after coca b128
# OOMed (RESOURCE_EXHAUSTED) — b192 would have wasted two more attempts.
# Points: CoCa rows at feasible batches, big-model rows stranded by the
# 08/17-18 outage, the EVA02 identity-prefix-rope A/B + trace, and a
# stretch ViT-bigG-14 (2.5B param) single-chip train point.
cd /root/repo
LOG=tools/r3_big_models.log

# Wait for the in-flight coca b128 try-2 bench (orphaned when queue4 was
# killed) to release the exclusive chip.
while kill -0 4938 2>/dev/null; do sleep 60; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q6) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q6 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# Single-attempt variant for OOM-prone points (a deterministic OOM would
# just burn a second compile).
run1() {
  wait_tunnel
  echo "=== Q6 $* [try 1/1] $(date +%H:%M:%S) ===" >> "$LOG"
  MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOG"
  return $rc
}

# 1. CoCa — the one model family without an on-chip train row (b128 OOMed).
if run --model coca_ViT-B-32 --batch-size 64; then
  run1 --model coca_ViT-B-32 --batch-size 96
fi
# 2. EVA02 identity-prefix rope A/B (prior row: 578 pairs/s) + trace.
run --model EVA02-B-16 --batch-size 64
run --model EVA02-B-16 --batch-size 64 --trace profiles/r3_eva02
# 3. Big-model rows stranded by the outage.
run1 --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run1 --model ViT-SO400M-14-SigLIP --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model EVA02-B-16 --infer --batch-size 256
# 4. Fused attention on the 257-token ViT-L (pads 257->384).
run1 --model ViT-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor --attn-impl fusedp
# 5. Stretch: 2.5B-param bigG on the 15.75G chip (full remat + adafactor).
run1 --model ViT-bigG-14 --precision pure_bf16 --batch-size 4 --remat --remat-policy full --opt adafactor
echo "QUEUE6 DONE" >> "$LOG"
