#!/bin/bash
# r5 wave 3: retries for the runs wave 1 lost to backend state — the
# cascade_train RESOURCE_EXHAUSTED (7.2 GB prior right after three large
# sessions) and the physically-impossible sd3_s4 reading (119 steps/s /
# "MFU 88" immediately after that OOM). Each retry waits 120 s after the
# previous process exits so the remote backend settles and HBM is fully
# released before the next attach.
set -u
OUT=/tmp/r5_bench_results.jsonl
mkdir -p /tmp/r5_logs
until grep -q "WAVE2 DONE" "$OUT" 2>/dev/null; do sleep 120; done
run() {
  local tag="$1"; shift
  sleep 120  # let the previous process's HBM actually release
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>/tmp/r5_logs/$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" >> "$OUT"
  echo "=== [$tag] done: $line ===" >&2
}
run cascade_train_retry BENCH_MODEL=cascade
run sd3_s4_retry BENCH_MODEL=sd3 BENCH_SAMPLES=4
run sd3_s8_retry BENCH_MODEL=sd3 BENCH_SAMPLES=8
echo "WAVE3 DONE $(date -u)" >> "$OUT"
