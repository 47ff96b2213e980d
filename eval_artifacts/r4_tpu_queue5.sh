#!/bin/bash
# Round-4 chip queue #5: device trace of the lever step (where do the
# non-gather ~235 ms go?) + RNG-impl A/B (threefry rolled-loop vs rbg).
cd /root/repo
while [ ! -f eval_artifacts/r4_queue4_done.marker ]; do sleep 60; done

echo "=== trace_step_r4 $(date)" >> eval_artifacts/r4_queue5.log
timeout 3600 python profiling/trace_step_r4.py >> eval_artifacts/r4_queue5.log 2>&1
echo "trace_rc=$? $(date)" >> eval_artifacts/r4_queue5.log

touch eval_artifacts/r4_queue5_done.marker
