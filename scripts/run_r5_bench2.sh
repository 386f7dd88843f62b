#!/bin/bash
# r5 second measurement wave: the Cascade dual-tree W8A8 warm-up A/B
# (built mid-round after the first queue launched) + its composition with
# share_warmup. Waits for the first queue's bench section to finish so the
# window stays one-XLA-process clean.
set -u
OUT=/tmp/r5_bench_results.jsonl
mkdir -p /tmp/r5_logs
until grep -q "BENCH QUEUE DONE\|ALL DONE" "$OUT" 2>/dev/null; do sleep 120; done
run() {
  local tag="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>/tmp/r5_logs/$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" >> "$OUT"
  echo "=== [$tag] done: $line ===" >&2
}
# the acceptance stage of queue 1 may still be running after BENCH QUEUE
# DONE — acceptance is a long single process, so wait for ALL DONE too
until grep -q "ALL DONE" "$OUT" 2>/dev/null; do sleep 120; done
run cascade_w8a8dual BENCH_MODEL=cascade BENCH_QUANT=w8a8-dual
run cascade_w8a8dual_s4_share BENCH_MODEL=cascade BENCH_QUANT=w8a8-dual BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
echo "WAVE2 DONE $(date -u)" >> "$OUT"
