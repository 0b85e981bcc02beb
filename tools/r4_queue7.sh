#!/bin/bash
# r4 queue 7 — rope-in-kernel fusedp (commit 9f41fad):
#  1. EVA02-B-16 b64 fusedp — rope now rotates in VMEM (prev 749.59)
#  2. default headline b88 confirm — non-rope kernel path is op-identical
#     but the official driver bench runs this config; confirm no regression
#  3. EVA02 fusedp trace — per-op attn bytes before/after rope-in-kernel
cd /root/repo
LOG=tools/r4_bench.log

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
    TMP=$(mktemp)
    echo "=== Q7 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
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

run --model EVA02-B-16 --batch-size 64 --attn-impl fusedp
run --batch-size 88
run --model EVA02-B-16 --batch-size 64 --attn-impl fusedp --trace profiles/r4_eva02_ropek --steps 20
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> "$LOG"
