#!/bin/bash
# r5 acceptance, take 2. Take 1 trained in 580.9 s (recorded below) but its
# sweep ran the FULL 500-case prompts-person.csv at a degraded-window pace
# (17→26 s/case and worsening — same backend droop that produced the
# anomalous sdxl_train row) = a ~3.6 h sweep that would have starved the
# remaining measurement waves. This rerun reuses the trained slider
# (--skip_train) and bounds the sweep to 150 cases — comparable to what the
# r3 sweep stage (711.3 s) could have physically covered at the measured
# steady-state img/s; the ledger row reports s/case alongside the total so
# the budget is explicit.
set -u
cd /root/repo
OUT=bench_r5/results.jsonl
mkdir -p bench_r5/logs
SLIDER=/tmp/acc_r5_models/acc_r5_alpha1.0_rank4_noxattn/acc_r5_alpha1.0_rank4_noxattn_last.safetensors
sleep 180  # settle after killing take 1 mid-sweep
timeout 14400 python -m sliders_conceptmod_tpu.cli.acceptance \
  --config_file bench_r5/config-xl-acc200.yaml --prompts_path prompts/prompts-person.csv \
  --base /tmp/drill/sdxl_drill.safetensors --save_path /tmp/acc_r5_take2 \
  --skip_train --model_name "$SLIDER" \
  --name acc_r5 --rank 4 --scales=-1,0,1 --ddim_steps 50 --image_size 512 --batch_scales \
  --till_case 150 \
  --clip_model /tmp/r5_scorers/tiny_clip \
  --alexnet_weights /tmp/r5_scorers/alexnet.pth --lpips_weights /tmp/r5_scorers/lpips_alex.pth \
  > bench_r5/logs/acceptance2.log 2>&1
rc=$?
echo "{\"tag\": \"acceptance\", \"rc\": $rc, \"ts\": \"$(date -u +%FT%TZ)\", \"train_seconds_take1\": 580.9, \"json\": $(cat /tmp/acc_r5_take2/acceptance.json 2>/dev/null || echo null)}" >> "$OUT"
echo "ACCEPTANCE DONE $(date -u)" >> "$OUT"
