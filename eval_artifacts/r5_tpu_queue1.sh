#!/bin/bash
# Round-5 chip queue #1: runs after the perf_hitcomp_r5 ladder exits.
# Stages write their own JSONs; each gets a timeout and an rc line.
cd /root/repo
LOG=eval_artifacts/r5_queue1.log

# wait for the ladder process to finish
while ps -p "$(cat /tmp/perf_r5.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 60
done

echo "=== quality_ab_r5 $(date)" >> $LOG
timeout 10800 python -u eval_artifacts/quality_ab_r5.py >> $LOG 2>&1
echo "qab_rc=$? $(date)" >> $LOG

echo "=== quality_20min_r5 $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/quality_20min_r5.py >> $LOG 2>&1
echo "q20_rc=$? $(date)" >> $LOG

echo "=== roofline3 $(date)" >> $LOG
timeout 3600 python -u eval_artifacts/roofline3.py >> $LOG 2>&1
echo "rl3_rc=$? $(date)" >> $LOG

echo "=== trace_step_r5 $(date)" >> $LOG
timeout 3600 python -u profiling/trace_step_r5.py >> $LOG 2>&1
echo "trace_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue1_done.marker
echo "queue1 done $(date)" >> $LOG
