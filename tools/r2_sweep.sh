#!/usr/bin/env bash
# Round-2 perf sweep on the real chip. Serial (the chip is exclusive).
# Appends config-tagged JSON lines to tools/r2_bench_results.jsonl and a
# full log to tools/r2_bench.log. Run via nohup.
set -u
cd /root/repo
RES=tools/r2_bench_results.jsonl
LOG=tools/r2_bench.log

run() {
  local tag="$1"; shift
  echo "=== $(date -u +%H:%M:%S) START $tag : $*" >> "$LOG"
  out=$(timeout 3000 python bench.py --mfu "$@" 2>>"$LOG")
  rc=$?
  echo "=== $(date -u +%H:%M:%S) END $tag rc=$rc" >> "$LOG"
  if [ -n "$out" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $out}" >> "$RES"
  else
    echo "{\"tag\": \"$tag\", \"result\": null, \"rc\": $rc}" >> "$RES"
  fi
}

# 1. Re-measure the default (now uint8 H2D + device normalize) + trace + MFU
run b80_default --trace /root/repo/profiles/b80
# 2. MLP-only remat batch sweep
run b96_mlponly  --batch-size 96  --remat --remat-policy mlp_only
run b112_mlponly --batch-size 112 --remat --remat-policy mlp_only
run b128_mlponly --batch-size 128 --remat --remat-policy mlp_only
# 3. No-remat b96 (b88 fit at r1; check if the uint8 feed freed enough HBM)
run b96_noremat --batch-size 96
# 4. bf16 Adam mu at the default batch
run b80_bf16mu --bf16-moments
echo "=== $(date -u +%H:%M:%S) SWEEP DONE" >> "$LOG"
