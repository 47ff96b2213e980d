#!/bin/bash
# Round-5 chip queue #6 (chained on queue #5): the bg-level A/B on the
# shipping no-mask profile (period 2 + auto lever-start gate). Queue 4
# skipped it on an over-strict threshold (gate recovery 22.2 dB vs the
# 24.8 no-lever anchor, -2.6 dB > my 1.5 dB gate), but the gated
# baseline is HEALTHY (occupancy 0.0104 = the anchor's 0.0102), so
# bg-level deltas measured on it are meaningful — and the step floor
# model (step_floor_model_r5.json) just showed the bg field is ~2/3 of
# the settled step, making bg_nr_levels the #1 remaining throughput
# lever.
cd /root/repo
LOG=eval_artifacts/r5_queue6.log

while [ ! -f eval_artifacts/r5_queue5_done.marker ]; do sleep 60; done

echo "=== bg_levels_ab_r5 redo (auto gate) $(date)" >> $LOG
BGAB_PERIOD=2 BGAB_GATE=auto timeout 14400 \
  python -u eval_artifacts/bg_levels_ab_r5.py >> $LOG 2>&1
echo "bgab_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue6_done.marker
echo "queue6 done $(date)" >> $LOG
