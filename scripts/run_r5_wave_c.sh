#!/bin/bash
# r5 wave C (exploratory, runs LAST): push the shared-warm-up DP-width trend
# one notch further on the two families where it pays most — share_warmup's
# selling point is warm-up cost flat in S, so samples/s should keep rising
# with S until the tails saturate the chip. Runs after the retry wave so an
# OOM here cannot poison the ledger rows (wave-1 lesson: the reading right
# after an OOM was garbage).
set -u
cd /root/repo
OUT=bench_r5/results.jsonl
mkdir -p bench_r5/logs
until grep -q "RETRY DONE" "$OUT" 2>/dev/null; do sleep 120; done
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
run sd3_s16_share BENCH_MODEL=sd3 BENCH_SAMPLES=16 BENCH_SHARE_WARMUP=1
run cascade_s8_share BENCH_MODEL=cascade BENCH_SAMPLES=8 BENCH_SHARE_WARMUP=1
run sdxl_s8_share BENCH_SAMPLES=8 BENCH_SHARE_WARMUP=1
echo "WAVE C DONE $(date -u)" >> "$OUT"
