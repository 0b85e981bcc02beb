#!/bin/bash
# r4 queue 10 — rerun of queue9's A/B points (q9 was cut off by the round
# wall clock at 10:41 before its first run completed):
#  1. ViT-B-16 b88 fusedp batched-head mode (vs 896.4 loop headline)
#  2. EVA02-B-16 b64 fusedp batched-head mode (vs 754.21 loop+rope-in-kernel)
#  3. ViT-B-16 b88 attn-impl fused (grouped [B*H, Np, D] layout — batched
#     dots paid for by HBM transpose+pad; never previously measured)
cd /root/repo
LOG=tools/r4_bench.log

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q10) ===" >> "$LOG"
    sleep 180
  done
}

run() {
  for attempt in 1 2; do
    wait_tunnel
    TMP=$(mktemp)
    echo "=== Q10 [env $MRCLIP_FUSEDP_HEADS] $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4200 python bench.py "$@" > "$TMP" 2>&1
    rc=$?
    cat "$TMP" >> "$LOG"
    echo "rc=$rc" >> "$LOG"
    if [ $rc -eq 0 ]; then rm -f "$TMP"; return 0; fi
    if grep -qE "RESOURCE_EXHAUSTED|ResourceExhausted|Out of memory" "$TMP"; then
      echo "(deterministic OOM — not retrying)" >> "$LOG"
      rm -f "$TMP"
      return $rc
    fi
    rm -f "$TMP"
  done
  return 1
}

export MRCLIP_FUSEDP_HEADS=batched
run --batch-size 88
run --model EVA02-B-16 --batch-size 64 --attn-impl fusedp
unset MRCLIP_FUSEDP_HEADS
run --batch-size 88 --attn-impl fused
echo "QUEUE10 DONE $(date +%H:%M:%S)" >> "$LOG"
