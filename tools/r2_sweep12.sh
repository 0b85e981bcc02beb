#!/usr/bin/env bash
# Round-2 sweep 12: ViT-L-14 no-remat small-batch — bf16 scores halve the
# attention residual memory, so b16/b20 may fit without remat's ~30%
# recompute (b24 no-remat OOMed).
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

for pidf in /tmp/r2_sweep11.pid; do
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

run L14_b16_attnbf16_noremat --model ViT-L-14 --batch-size 16 --precision pure_bf16 --steps 30
run L14_b20_attnbf16_mlponly --model ViT-L-14 --batch-size 20 --remat --remat-policy mlp_only --precision pure_bf16 --steps 30
echo "=== $(date -u +%H:%M:%S) SWEEP12 DONE" >> "$LOG"
