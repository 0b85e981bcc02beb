#!/usr/bin/env bash
# Round-2 sweep 8: stack attn_impl=bf16 with other knobs (after sweep7).
#  - b80 + bf16 Adam mu (stacked wins?)
#  - ViT-L-14 no-remat at b24/b28: halved score memory may fit where fp32
#    scores OOMed, removing remat recompute
#  - forward-only infer under bf16 scores
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep7.pid; do
  if [ -f "$pidf" ]; then
    while kill -0 "$(cat $pidf)" 2>/dev/null; do sleep 60; done
  fi
done

run() {
  local tag="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $tag : $*" >> "$LOG"
  out=$(timeout 3600 python bench.py "$@" 2>>"$LOG")
  rc=$?
  echo "=== $(date -u +%H:%M:%S) END $tag rc=$rc" >> "$LOG"
  if [ -n "$out" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $out}" >> "$RES"
  else
    echo "{\"tag\": \"$tag\", \"result\": null, \"rc\": $rc}" >> "$RES"
  fi
}

run b80_attnbf16_mu --batch-size 80 --attn-impl bf16 --bf16-moments
run L14_b24_attnbf16 --model ViT-L-14 --batch-size 24 --attn-impl bf16 --precision pure_bf16 --bf16-moments --steps 30
run L14_b16_attnbf16_remat --model ViT-L-14 --batch-size 16 --attn-impl bf16 --remat --precision pure_bf16 --bf16-moments --steps 30
run infer_attnbf16_b256 --infer --batch-size 256 --attn-impl bf16
echo "=== $(date -u +%H:%M:%S) SWEEP8 DONE" >> "$LOG"
