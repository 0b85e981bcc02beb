#!/bin/bash
# Seventh r3 TPU queue: the chunked CoCa captioning-CE payoff — batches the
# dense loss OOMs on (b128 RESOURCE_EXHAUSTED), streamed per sequence chunk.
cd /root/repo
LOG=tools/r3_big_models.log

until grep -q "QUEUE6 DONE" "$LOG"; do sleep 120; done

probe() {
  timeout 180 python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())" >> /tmp/probe.log 2>&1
}

wait_tunnel() {
  until probe; do
    echo "=== TUNNEL DOWN $(date +%H:%M:%S), waiting (q7) ===" >> "$LOG"
    sleep 180
  done
}

run1() {
  wait_tunnel
  echo "=== Q7 $* [try 1/1] $(date +%H:%M:%S) ===" >> "$LOG"
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
echo "QUEUE7 DONE" >> "$LOG"
