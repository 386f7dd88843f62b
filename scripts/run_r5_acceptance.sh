#!/bin/bash
# r5 acceptance wave: waits for the main bench queue (run_r5_queue.sh) to
# finish, then re-runs the full 3-stage acceptance pass (VERDICT r4 next #7:
# the r4 number carried a degraded-window caveat and the sweep/scorer stages
# were never re-timed). Prereqs (drill file, scorer weights, config) are
# rebuilt if missing — the previous session lost all of them to a /tmp wipe.
set -u
cd /root/repo
OUT=bench_r5/results.jsonl
mkdir -p bench_r5/logs /tmp/drill
until grep -q "QUEUE DONE" "$OUT" 2>/dev/null; do sleep 120; done

if [ ! -f /tmp/drill/sdxl_drill.safetensors ]; then
  echo "=== rebuilding drill checkpoint $(date -u +%H:%M:%S) ===" >&2
  PYTHONPATH= JAX_PLATFORMS=cpu python - <<'EOF' 2>bench_r5/logs/drill_build.log
import json, sys
sys.path.insert(0, "scripts")
from full_checkpoint_drill import build_file
print(json.dumps(build_file("/tmp/drill/sdxl_drill.safetensors")))
EOF
fi
if [ ! -d /tmp/r5_scorers/tiny_clip ]; then
  PYTHONPATH= JAX_PLATFORMS=cpu python scripts/make_scorer_weights.py /tmp/r5_scorers \
    2>bench_r5/logs/scorers.log
fi

sleep 120  # backend settle after the last queue run
echo "=== acceptance $(date -u +%H:%M:%S) ===" >&2
timeout 28800 python -m sliders_conceptmod_tpu.cli.acceptance \
  --config_file bench_r5/config-xl-acc200.yaml --prompts_path prompts/prompts-person.csv \
  --base /tmp/drill/sdxl_drill.safetensors --save_path /tmp/acc_r5 \
  --name acc_r5 --rank 4 --scales=-1,0,1 --ddim_steps 50 --image_size 512 --batch_scales \
  --clip_model /tmp/r5_scorers/tiny_clip \
  --alexnet_weights /tmp/r5_scorers/alexnet.pth --lpips_weights /tmp/r5_scorers/lpips_alex.pth \
  > bench_r5/logs/acceptance.log 2>&1
rc=$?
echo "{\"tag\": \"acceptance\", \"rc\": $rc, \"ts\": \"$(date -u +%FT%TZ)\", \"json\": $(cat /tmp/acc_r5/acceptance.json 2>/dev/null || echo null)}" >> "$OUT"
echo "ACCEPTANCE DONE $(date -u)" >> "$OUT"
