#!/bin/bash
# Round-5 chip queue #6 (chained on queue #5):
# 1. ST mask-ckpt diagnostic matrix — sphere tracing loses ~16 dB on
#    with_mask checkpoints (23.6 vs 39.2 volumetric at the same view)
#    while r4's no-mask ckpt traced at 40.3 with the same code.
# 2. bg-level A/B on the shipping no-mask profile (period 2 + auto
#    gate). Queue 4 skipped it on an over-strict threshold; the gated
#    baseline is healthy (occupancy 0.0104 = the no-lever anchor's),
#    and the step floor model shows the bg field is ~2/3 of the step —
#    bg_nr_levels is the #1 remaining throughput lever.
cd /root/repo
LOG=eval_artifacts/r5_queue6.log

while [ ! -f eval_artifacts/r5_queue5_done.marker ]; do sleep 60; done

echo "=== st_mask_diag_r5 $(date)" >> $LOG
timeout 3600 python -u eval_artifacts/st_mask_diag_r5.py >> $LOG 2>&1
echo "diag_rc=$? $(date)" >> $LOG

echo "=== bg_levels_ab_r5 redo (auto gate) $(date)" >> $LOG
BGAB_PERIOD=2 BGAB_GATE=auto timeout 14400 \
  python -u eval_artifacts/bg_levels_ab_r5.py >> $LOG 2>&1
echo "bgab_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue6_done.marker
echo "queue6 done $(date)" >> $LOG
