#!/bin/bash
# r4 queue 9 — scratch-batched head mode A/B (probe validated on-chip
# 10:35, tools/probe_batched_kernel.py: maxdiff 0.0):
#  1. ViT-B-16 b88 fusedp batched (vs 896.4 loop)
#  2. EVA02-B-16 b64 fusedp batched (vs 754.21 loop + rope-in-kernel)
#  3. ViT-B-16 b88 attn-impl fused (grouped [B*H, Np, D] layout: batched
#     dots paid for by HBM transpose+pad — never previously measured)
cd /root/repo
LOG=tools/r4_bench.log

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
    TMP=$(mktemp)
    echo "=== Q9 [env $MRCLIP_FUSEDP_HEADS] $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
    MRCLIP_BENCH_ATTEMPTS=1 timeout 4800 python bench.py "$@" > "$TMP" 2>&1
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
echo "QUEUE9 DONE $(date +%H:%M:%S)" >> "$LOG"
