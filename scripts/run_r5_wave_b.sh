#!/bin/bash
# r5 wave B: flagship composition rows — does the shared-prefix warm-up
# stack with the W8A8 warm-up on SD1/XL the way it does on SD3/Cascade?
# Same-session controls; waits for the acceptance wave so the window stays
# one-XLA-process clean. Idempotent like run_r5_queue.sh.
set -u
cd /root/repo
OUT=bench_r5/results.jsonl
mkdir -p bench_r5/logs
until grep -q "ACCEPTANCE DONE" "$OUT" 2>/dev/null; do sleep 120; done
run() {
  local tag="$1"; shift
  if grep -q "\"tag\": \"$tag\".*\"result\": {" "$OUT" 2>/dev/null; then
    echo "=== [$tag] already recorded, skip ===" >&2
    return
  fi
  sleep 120
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>bench_r5/logs/$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"ts\": \"$(date -u +%FT%TZ)\", \"result\": ${line:-null}}" >> "$OUT"
  echo "=== [$tag] done: $line ===" >&2
}
run sdxl_s4 BENCH_SAMPLES=4
run sdxl_s4_share BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
run sdxl_s4_share_w8a8 BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1 BENCH_QUANT=w8a8
run sd15_s4_share_w8a8 BENCH_MODEL=sd15 BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1 BENCH_QUANT=w8a8
run sd15_s4_share BENCH_MODEL=sd15 BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
echo "WAVE B DONE $(date -u)" >> "$OUT"
