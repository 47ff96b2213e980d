#!/bin/bash
# Round-5 chip queue #7 (chained on queue #6): jump-gate A/B on the
# flagship ckpt (the mask-ckpt tunnel fix), then a final bench preview
# to re-seed the cache after the tracer/bench changes.
cd /root/repo
LOG=eval_artifacts/r5_queue7.log

while [ ! -f eval_artifacts/r5_queue6_done.marker ]; do sleep 60; done

echo "=== st_gate_ab_r5 $(date)" >> $LOG
timeout 7200 python -u eval_artifacts/st_gate_ab_r5.py >> $LOG 2>&1
echo "gab_rc=$? $(date)" >> $LOG

touch eval_artifacts/r5_queue7_done.marker
echo "queue7 done $(date)" >> $LOG
