#!/bin/bash
# r5 measurement queue, restart-resilient edition. The first r5 session's
# waves (run_r5_bench{,2,3}.sh) appended to /tmp and the machine restarted
# mid-queue: results + compile cache gone. This queue therefore
#   - appends results INSIDE the repo (bench_r5/results.jsonl) so nothing
#     is lost on restart,
#   - is idempotent: a tag already present in results.jsonl with a non-null
#     result is skipped, so re-running resumes where it left off,
#   - orders runs by VERDICT-r4 priority (share_warmup A/Bs first, then
#     overlay A/Bs, then the ledger refresh, then compositions/infer),
#   - sleeps 120 s between runs so the remote backend's HBM actually
#     releases (wave-1 lesson: a 7.2 GB cascade attach straight after three
#     large sessions hit RESOURCE_EXHAUSTED, and the run after that OOM
#     read a physically-impossible 119 steps/s).
set -u
cd /root/repo
OUT=bench_r5/results.jsonl
mkdir -p bench_r5/logs
touch "$OUT"
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

# --- 1: share_warmup A/Bs, SD3 + Cascade (VERDICT r4 next #1)
run sd3_s4 BENCH_MODEL=sd3 BENCH_SAMPLES=4
run sd3_s4_share BENCH_MODEL=sd3 BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
run cascade_s4 BENCH_MODEL=cascade BENCH_SAMPLES=4
run cascade_s4_share BENCH_MODEL=cascade BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
run sd3_s8 BENCH_MODEL=sd3 BENCH_SAMPLES=8
run sd3_s8_share BENCH_MODEL=sd3 BENCH_SAMPLES=8 BENCH_SHARE_WARMUP=1

# --- 2: student_overlay A/Bs (VERDICT r4 next #5); cascade_train doubles
# as the Cascade ledger-refresh row (samples=1, overlay default 0)
run cascade_train BENCH_MODEL=cascade
run cascade_overlay2 BENCH_MODEL=cascade BENCH_OVERLAY=2
run imgslider_sd1_ov0 BENCH_MODEL=imgslider BENCH_OVERLAY=0
run imgslider_sd1_ov2 BENCH_MODEL=imgslider BENCH_OVERLAY=2
run imgslider_xl_ov0 BENCH_MODEL=imgslider-xl BENCH_OVERLAY=0
run imgslider_xl_ov2 BENCH_MODEL=imgslider-xl BENCH_OVERLAY=2

# --- 3: ledger refresh in the same clean window (VERDICT r4 next #7)
run sdxl_train
run sd15_train BENCH_MODEL=sd15
run sd3_train BENCH_MODEL=sd3

# --- 4: w8a8 compositions (does share stack with the quant warm-up?)
run sd3_w8a8dual_s4 BENCH_MODEL=sd3 BENCH_QUANT=w8a8-dual BENCH_SAMPLES=4
run sd3_w8a8dual_s4_share BENCH_MODEL=sd3 BENCH_QUANT=w8a8-dual BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
run cascade_w8a8dual BENCH_MODEL=cascade BENCH_QUANT=w8a8-dual
run cascade_w8a8dual_s4_share BENCH_MODEL=cascade BENCH_QUANT=w8a8-dual BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1

# --- 5: SDXL 512px inference refresh
run xl_infer_512 BENCH_MODE=infer BENCH_RES=512 BENCH_DDIM_STEPS=50

echo "QUEUE DONE $(date -u)" >> "$OUT"
