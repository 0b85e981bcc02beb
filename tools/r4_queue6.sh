#!/bin/bash
# r4 queue 6 — ViTamin-L b16 clean retry. Queue5's b16 attempt died on a
# tunnel error ("response body closed") but the retry guard grepped the
# shared log tail, which still held the PREVIOUS b32 run's
# RESOURCE_EXHAUSTED lines, so it was misclassified as a deterministic OOM.
# Fix: capture each attempt's own output in a temp file and grep that.
cd /root/repo
LOG=tools/r4_bench.log

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
    TMP=$(mktemp)
    echo "=== Q6 $* [try $attempt] $(date +%H:%M:%S) ===" >> "$LOG"
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

run --model ViTamin-L --batch-size 16 --remat --precision pure_bf16 --opt adafactor
echo "QUEUE6 DONE $(date +%H:%M:%S)" >> "$LOG"
