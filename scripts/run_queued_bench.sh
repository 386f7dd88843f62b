#!/bin/bash
# Queued TPU A/B measurements from BASELINE.md "Measured numbers pending"
# (round 2; run sequentially — one XLA process at a time on this host).
# Results append to /tmp/bench_queue_results.jsonl with a tag per line.
set -u
OUT=/tmp/bench_queue_results.jsonl
run() {
  local tag="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>/tmp/bench_queue_stderr_$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" >> "$OUT"
  echo "=== [$tag] done: $line ===" >&2
}

# 1. int8 frozen base on the SDXL train step (A/B vs 6.074 bf16 headline)
run sdxl_train_quant BENCH_QUANT=1
# 2. W8A8 warm-up chain on the SDXL train step
run sdxl_train_w8a8 BENCH_QUANT=w8a8
# 3. Full-depth Flux int8 train (fits one v5e only with quantize_base)
run flux_train_quant BENCH_MODEL=flux BENCH_QUANT=1 BENCH_STEPS=8
# 4. XL 1024px 5-scale batched sweep, int8 weight-only
run xl_infer_quant BENCH_MODE=infer BENCH_QUANT=1
# 5. XL sweep, W8A8 (int8 MXU fast path) A/B vs weight-only
run xl_infer_w8a8 BENCH_MODE=infer BENCH_QUANT=w8a8
# 6. Full-depth Flux inference sweep, int8
run flux_infer_quant BENCH_MODEL=flux BENCH_MODE=infer BENCH_QUANT=1 BENCH_STEPS=8
# 7. Flux sweep W8A8
run flux_infer_w8a8 BENCH_MODEL=flux BENCH_MODE=infer BENCH_QUANT=w8a8 BENCH_STEPS=8
echo "ALL DONE $(date -u)" >> "$OUT"
