#!/bin/bash
# r5 queued TPU measurement session (VERDICT r4 tasks 1, 5, 7):
#   A) ledger refresh in one clean window (SDXL/SD1.5/SD3/Cascade train,
#      SDXL 512px infer),
#   B) share_warmup A/Bs on SD3 (samples 4 & 8, + w8a8-dual composition)
#      and Cascade (samples 4),
#   C) student_overlay A/Bs for Cascade and both image-pair trainers,
#   D) full cli/acceptance.py pass with all three stage timings.
# Sequential — ONE XLA process at a time on this host. Results append to
# /tmp/r5_bench_results.jsonl; per-run stderr in /tmp/r5_logs/.
set -u
OUT=/tmp/r5_bench_results.jsonl
mkdir -p /tmp/r5_logs
run() {
  local tag="$1"; shift
  echo "=== [$tag] $(date -u +%H:%M:%S) env: $* ===" >&2
  local line
  line=$(env "$@" timeout 5400 python bench.py 2>/tmp/r5_logs/$tag.log | tail -1)
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" >> "$OUT"
  echo "=== [$tag] done: $line ===" >&2
}

# --- A: ledger refresh (clean-window re-measurement of the r2-vintage rows)
run sdxl_train BENCH_DUMMY=0
run sd15_train BENCH_MODEL=sd15
run sd3_train BENCH_MODEL=sd3
run cascade_train BENCH_MODEL=cascade

# --- B: share_warmup A/Bs (same session as their controls)
run sd3_s4 BENCH_MODEL=sd3 BENCH_SAMPLES=4
run sd3_s4_share BENCH_MODEL=sd3 BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
run sd3_s8 BENCH_MODEL=sd3 BENCH_SAMPLES=8
run sd3_s8_share BENCH_MODEL=sd3 BENCH_SAMPLES=8 BENCH_SHARE_WARMUP=1
run cascade_s4 BENCH_MODEL=cascade BENCH_SAMPLES=4
run cascade_s4_share BENCH_MODEL=cascade BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1
# composition: does share_warmup stack with SD3's +23% w8a8 warm-up lever?
run sd3_w8a8dual_s4 BENCH_MODEL=sd3 BENCH_QUANT=w8a8-dual BENCH_SAMPLES=4
run sd3_w8a8dual_s4_share BENCH_MODEL=sd3 BENCH_QUANT=w8a8-dual BENCH_SAMPLES=4 BENCH_SHARE_WARMUP=1

# --- C: student_overlay A/Bs (cascade_train above is the overlay-0 control)
run cascade_overlay2 BENCH_MODEL=cascade BENCH_OVERLAY=2
run imgslider_sd1_ov0 BENCH_MODEL=imgslider BENCH_OVERLAY=0
run imgslider_sd1_ov2 BENCH_MODEL=imgslider BENCH_OVERLAY=2
run imgslider_xl_ov0 BENCH_MODEL=imgslider-xl BENCH_OVERLAY=0
run imgslider_xl_ov2 BENCH_MODEL=imgslider-xl BENCH_OVERLAY=2

# --- A (cont.): SDXL 512px inference
run xl_infer_512 BENCH_MODE=infer BENCH_RES=512 BENCH_DDIM_STEPS=50

echo "BENCH QUEUE DONE $(date -u)" >> "$OUT"

# --- D: full acceptance pass (drill single file, 200-iter noxattn train,
# 3-scale batched sweep over prompts-person.csv, synthetic scorer weights)
sed 's#/tmp/acc_r4_models#/tmp/acc_r5_models#' /tmp/config-xl-acc200.yaml > /tmp/config-xl-acc200-r5.yaml
PYTHONPATH= JAX_PLATFORMS=cpu python scripts/make_scorer_weights.py /tmp/r5_scorers 2>/tmp/r5_logs/scorers.log
timeout 28800 python -m sliders_conceptmod_tpu.cli.acceptance \
  --config_file /tmp/config-xl-acc200-r5.yaml --prompts_path prompts/prompts-person.csv \
  --base /tmp/drill/sdxl_drill.safetensors --save_path /tmp/acc_r5 \
  --name acc_r5 --rank 4 --scales=-1,0,1 --ddim_steps 50 --image_size 512 --batch_scales \
  --clip_model /tmp/r5_scorers/tiny_clip \
  --alexnet_weights /tmp/r5_scorers/alexnet.pth --lpips_weights /tmp/r5_scorers/lpips_alex.pth \
  > /tmp/r5_logs/acceptance.log 2>&1
echo "{\"tag\": \"acceptance\", \"rc\": $?, \"json\": $(cat /tmp/acc_r5/acceptance.json 2>/dev/null || echo null)}" >> "$OUT"
echo "ALL DONE $(date -u)" >> "$OUT"
