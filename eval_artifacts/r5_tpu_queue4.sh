#!/bin/bash
# Round-5 chip queue #4 (chained on queue #3): the train-step floor model
# (VERDICT r4 item 1's closure clause), then the bg-level A/B redo under
# the SHIPPING no-mask profile (period 2 + the auto lever-start gate) —
# run only if the bisect's gate arm actually rescued no-mask quality
# (otherwise the baseline would collapse again and the deltas would be
# meaningless, like the first run's).
cd /root/repo
LOG=eval_artifacts/r5_queue4.log

while [ ! -f eval_artifacts/r5_queue3_done.marker ]; do sleep 60; done

echo "=== step_floor_model_r5 $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/step_floor_model_r5.py >> $LOG 2>&1
echo "sfm_rc=$? $(date)" >> $LOG

OK=$(python - <<'EOF'
import json
try:
    d = json.load(open("eval_artifacts/nomask_bisect_r5.json"))
    v = d["per_variant"]
    none = v["none"]["psnr_fg_mean"]
    gated = v["lod_p2_hc_gate"]["psnr_fg_mean"]
    print("yes" if gated >= none - 1.5 else "no")
except Exception:
    print("no")
EOF
)
if [ "$OK" = "yes" ]; then
  echo "=== bg_levels_ab_r5 redo (auto gate) $(date)" >> $LOG
  BGAB_PERIOD=2 BGAB_GATE=auto timeout 14400 \
    python -u eval_artifacts/bg_levels_ab_r5.py >> $LOG 2>&1
  echo "bgab_rc=$? $(date)" >> $LOG
else
  echo "bg A/B redo SKIPPED: gate arm did not rescue no-mask quality" >> $LOG
fi

touch eval_artifacts/r5_queue4_done.marker
echo "queue4 done $(date)" >> $LOG
