#!/bin/bash
# Robust TPU bench runner for the rest of round 3. The tunnel has been
# flapping (backend init UNAVAILABLE, each failed attempt burns ~25 min):
# probe tunnel health before every point, wait while it is down, and retry
# each point once. One point at a time — the chip is exclusive.
cd /root/repo
LOG=tools/r3_big_models.log

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# Highest value first: the two fused-attention kernel variants head-to-head.
run --attn-impl fusedp
run --attn-impl fused
run  # default confirm after the r3 review fixes
run --attn-impl fusedp --batch-size 128
run --attn-impl fusedp --batch-size 160
# Big-model rows.
run --model ViT-SO400M-14-SigLIP --precision pure_bf16 --batch-size 16 --remat --opt adafactor --gelu-approx
run --model EVA02-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor
run --model ViT-g-14 --precision pure_bf16 --batch-size 8 --remat --remat-policy full --opt adafactor --gelu-approx
run --model ViT-bigG-14 --precision pure_bf16 --batch-size 4 --remat --remat-policy full --opt adafactor --gelu-approx
# Loss-objective + serving points.
run --model EVA02-B-16 --infer --batch-size 256
run --loss siglip
run --loss clip
run --infer --attn-impl fusedp --batch-size 256
run --attn-impl fusedp --trace profiles/r3_fused
echo "QUEUE DONE" >> "$LOG"
