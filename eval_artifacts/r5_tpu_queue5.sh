#!/bin/bash
# Round-5 chip queue #5 (chained on queue #4): rerun the ST 1080p ladder
# on the 12k flagship checkpoint (the queue-3 run picked the half-trained
# q20/8000 ckpt and its quality guard floored at 20.5 dB), then the
# post-fix bench preview — validates the hit-frac hysteresis fix (settle
# 0.5, not 0.625), the no-mask lever gate in warmup, and the
# terminal-point AOT prefetch, and re-seeds the persistent cache so the
# driver's end-of-round bench run is warm.
cd /root/repo
LOG=eval_artifacts/r5_queue5.log

while [ ! -f eval_artifacts/r5_queue4_done.marker ]; do sleep 60; done

echo "=== bench_st_1080p_r5 on flagship ckpt $(date)" >> $LOG
mv eval_artifacts/bench_st_1080p_r5.json \
   eval_artifacts/bench_st_1080p_r5_q20ckpt.json 2>/dev/null
ST_CKPT=eval_artifacts/flagship_r5_ckpt/flagship/12000/models \
  timeout 7200 python -u eval_artifacts/bench_st_1080p_r5.py >> $LOG 2>&1
echo "st_rc=$? $(date)" >> $LOG

echo "=== bench.py post-fix preview $(date)" >> $LOG
timeout 10800 python -u bench.py > eval_artifacts/bench_r5_preview2.json.tmp 2>> $LOG
rc=$?
tail -1 eval_artifacts/bench_r5_preview2.json.tmp > eval_artifacts/bench_r5_preview2.json
echo "bench_rc=$rc $(date)" >> $LOG

touch eval_artifacts/r5_queue5_done.marker
echo "queue5 done $(date)" >> $LOG
