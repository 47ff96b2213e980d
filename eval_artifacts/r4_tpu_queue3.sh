#!/bin/bash
# Round-4 chip queue #3: waits for queue #2, then 400^2 interactive A/B.
cd /root/repo
while [ ! -f eval_artifacts/r4_queue2_done.marker ]; do sleep 60; done
echo "=== interactive r4 $(date)" >> eval_artifacts/r4_queue3.log
timeout 3600 python eval_artifacts/bench_interactive_r4.py >> eval_artifacts/r4_queue3.log 2>&1
echo "interactive_rc=$? $(date)" >> eval_artifacts/r4_queue3.log
touch eval_artifacts/r4_queue3_done.marker
