#!/bin/bash
# Seventh r3 TPU queue: final-confirm the headline default, then the two
# points stranded when the 08/19 03:10 session ended (EVA02-B infer b256,
# ViT-L fusedp), then first-ever on-chip fusedp ViT-B point.
cd /root/repo
LOG=tools/r3_big_models.log

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q7) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    echo "=== Q7 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" >> "$LOG" 2>&1
    rc=$?
    echo "rc=$rc" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# 1. Headline confirm at current defaults (what the driver will run at round end).
run
# 2. Stranded: EVA02-B-16 serving point.
run --model EVA02-B-16 --infer --batch-size 256
# 3. Stranded: fused attention on the 257-token ViT-L (pads 257->384).
run --model ViT-L-14 --precision pure_bf16 --batch-size 16 --remat --opt adafactor --attn-impl fusedp
# 4. fusedp on ViT-B at the headline config (never measured on chip).
run --attn-impl fusedp
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> "$LOG"
