#!/bin/bash
# Round-5 chip queue #3 (chained on queue #2): the no-mask lever bisect
# (+ the lever_start_iter gate arm), the fixed ST 1080p ladder
# (shade_sdf_levels static-arg bug repaired), a clean 20-min anchor rerun
# on a quiet chip (pre-sized 4500 iters, period 2), and the cold-cache
# bench (VERDICT r4 item 2 evidence).
cd /root/repo
LOG=eval_artifacts/r5_queue3.log

while [ ! -f eval_artifacts/r5_queue2_done.marker ]; do sleep 60; done

echo "=== nomask_bisect_r5 $(date)" >> $LOG
timeout 14400 python -u eval_artifacts/nomask_bisect_r5.py >> $LOG 2>&1
echo "bisect_rc=$? $(date)" >> $LOG

echo "=== bench_st_1080p_r5 (fixed) $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/bench_st_1080p_r5.py >> $LOG 2>&1
echo "st_rc=$? $(date)" >> $LOG

echo "=== quality_20min_r5 clean rerun $(date)" >> $LOG
Q20_ITERS=4500 Q20_PERIOD=2 timeout 7200 \
  python -u eval_artifacts/quality_20min_r5.py >> $LOG 2>&1
echo "q20_rc=$? $(date)" >> $LOG

echo "=== bench cold $(date)" >> $LOG
bash eval_artifacts/bench_cold_r5.sh >> $LOG 2>&1
echo "cold_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue3_done.marker
echo "queue3 done $(date)" >> $LOG
