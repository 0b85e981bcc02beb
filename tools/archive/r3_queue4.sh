#!/bin/bash
# Fourth r3 TPU queue: points stranded when the tunnel died on 08/17-18.
# Same robust probing as r3_queue.sh — probe before each point, retry once,
# one point at a time (the chip is exclusive).
cd /root/repo
LOG=tools/r3_big_models.log

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
  done
  return 1
}

# 1. Headline confirm at current defaults (what the driver will run).
run
# 2. Pallas streaming loss: first-ever real-kernel run (tests use interpret).
run --loss-impl pallas
run --loss-impl chunked
# 3. CoCa — the one model family without an on-chip train row.
run --model coca_ViT-B-32 --batch-size 128
run --model coca_ViT-B-32 --batch-size 192
# 4. Big-model rows stranded by the outage.
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model ViT-SO400M-14-SigLIP --precision pure_bf16 --batch-size 16 --remat --opt adafactor --gelu-approx
run --model EVA02-B-16 --infer --batch-size 256
# 5. Fused attention on the 257-token ViT-L (pads 257->384).
run --model ViT-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor --attn-impl fusedp
echo "QUEUE4 DONE" >> "$LOG"
