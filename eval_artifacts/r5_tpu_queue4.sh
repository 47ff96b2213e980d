#!/bin/bash
# Round-5 chip queue #4 (chained on queue #3): the train-step floor model
# (VERDICT r4 item 1's closure clause), then the bg-level A/B redo at
# period 2 with the lever-start gate IF the no-mask bisect adopted it
# (the first bg A/B ran period 3 — later rejected — and its baseline
# collapsed, so its deltas were meaningless).
cd /root/repo
LOG=eval_artifacts/r5_queue4.log

while [ ! -f eval_artifacts/r5_queue3_done.marker ]; do sleep 60; done

echo "=== step_floor_model_r5 $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/step_floor_model_r5.py >> $LOG 2>&1
echo "sfm_rc=$? $(date)" >> $LOG

# gate selection: adopt the gate arm iff it recovers to within 1 dB of
# the no-lever anchor while the ungated lever arm does not
GATE=$(python - <<'EOF'
import json
try:
    d = json.load(open("eval_artifacts/nomask_bisect_r5.json"))
    v = d["per_variant"]
    none = v["none"]["psnr_fg_mean"]
    plain = v["lod_p2_hc"]["psnr_fg_mean"]
    gated = v["lod_p2_hc_gate"]["psnr_fg_mean"]
    print("0.35" if (gated >= none - 1.0 and plain < none - 1.0) else "0")
except Exception:
    print("0")
EOF
)
echo "bg A/B redo with BGAB_GATE=$GATE" >> $LOG
echo "=== bg_levels_ab_r5 redo $(date)" >> $LOG
BGAB_PERIOD=2 BGAB_GATE=$GATE timeout 14400 \
  python -u eval_artifacts/bg_levels_ab_r5.py >> $LOG 2>&1
echo "bgab_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue4_done.marker
echo "queue4 done $(date)" >> $LOG
