#!/bin/bash
# Round-5 chip queue #2: bg-level A/B, ST benches + floor model, flagship
# 12k refresh, and a full bench.py run (also seeds the driver's compile
# cache). Chained on queue #1's done marker.
cd /root/repo
LOG=eval_artifacts/r5_queue2.log

while [ ! -f eval_artifacts/r5_queue1_done.marker ]; do sleep 60; done

echo "=== bg_levels_ab_r5 $(date)" >> $LOG
timeout 10800 python -u eval_artifacts/bg_levels_ab_r5.py >> $LOG 2>&1
echo "bgab_rc=$? $(date)" >> $LOG

echo "=== bench_st_1080p_r5 $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/bench_st_1080p_r5.py >> $LOG 2>&1
echo "st_rc=$? $(date)" >> $LOG

echo "=== st_floor_model_r5 $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/st_floor_model_r5.py >> $LOG 2>&1
echo "floor_rc=$? $(date)" >> $LOG

echo "=== mask_quality_run_r5 (12k flagship refresh) $(date)" >> $LOG
MASK_PERIOD=${MASK_PERIOD:-2} timeout 10800 \
  python -u eval_artifacts/mask_quality_run_r5.py >> $LOG 2>&1
echo "mask_rc=$? $(date)" >> $LOG

echo "=== bench.py full $(date)" >> $LOG
timeout 10800 python -u bench.py > eval_artifacts/bench_r5_preview.json.tmp 2>> $LOG
tail -1 eval_artifacts/bench_r5_preview.json.tmp > eval_artifacts/bench_r5_preview.json
echo "bench_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue2_done.marker
echo "queue2 done $(date)" >> $LOG
