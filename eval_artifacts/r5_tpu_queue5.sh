#!/bin/bash
# Round-5 chip queue #5 (chained on queue #4): post-fix bench preview —
# validates the hit-frac hysteresis fix (settle at 0.5, not 0.625) and
# the terminal-point AOT prefetch, and re-seeds the persistent cache
# with the new settled-point graphs so the driver's end-of-round bench
# run is warm.
cd /root/repo
LOG=eval_artifacts/r5_queue5.log

while [ ! -f eval_artifacts/r5_queue4_done.marker ]; do sleep 60; done

echo "=== bench.py post-fix preview $(date)" >> $LOG
timeout 10800 python -u bench.py > eval_artifacts/bench_r5_preview2.json.tmp 2>> $LOG
rc=$?
tail -1 eval_artifacts/bench_r5_preview2.json.tmp > eval_artifacts/bench_r5_preview2.json
echo "bench_rc=$rc $(date)" >> $LOG

touch eval_artifacts/r5_queue5_done.marker
echo "queue5 done $(date)" >> $LOG
