#!/bin/bash
# r5 retry wave: sdxl_train read 0.1529 steps/s (MFU 0.015) in the main
# queue — 40x below the r4 headline (6.17 / MFU 0.594) while the rows
# before and after it (sd15 2.90, sd3 3.18) match their baselines, so the
# reading is a backend anomaly (same syndrome as wave 1's impossible
# sd3_s4), not a regression. Re-measure with a long settle, twice, so the
# pair also bounds run-to-run variance for the ledger.
set -u
cd /root/repo
OUT=bench_r5/results.jsonl
mkdir -p bench_r5/logs
until grep -q "WAVE B DONE" "$OUT" 2>/dev/null; do sleep 120; done
run() {
  local tag="$1"; shift
  if grep -q "\"tag\": \"$tag\".*\"result\": {" "$OUT" 2>/dev/null; then
    echo "=== [$tag] already recorded, skip ===" >&2
    return
  fi
  sleep 300
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>bench_r5/logs/$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"ts\": \"$(date -u +%FT%TZ)\", \"result\": ${line:-null}}" >> "$OUT"
  echo "=== [$tag] done: $line ===" >&2
}
run sdxl_train_retry
run sdxl_train_retry2
echo "RETRY DONE $(date -u)" >> "$OUT"
