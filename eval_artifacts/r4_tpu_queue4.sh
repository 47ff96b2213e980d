#!/bin/bash
# Round-4 chip queue #4: lever-profile stage breakdown + instance audit,
# isp12+curv8192 quality A/B, bench preview with the 1.5x rung ladder.
cd /root/repo
while [ ! -f eval_artifacts/r4_queue3_done.marker ]; do sleep 60; done

echo "=== profile_step_r4 $(date)" >> eval_artifacts/r4_queue4.log
timeout 3600 python profiling/profile_step_r4.py >> eval_artifacts/r4_queue4.log 2>&1
echo "profile_rc=$? $(date)" >> eval_artifacts/r4_queue4.log

echo "=== quality_ab_r4_isp $(date)" >> eval_artifacts/r4_queue4.log
timeout 5400 python eval_artifacts/quality_ab_r4_isp.py >> eval_artifacts/r4_queue4.log 2>&1
echo "isp_ab_rc=$? $(date)" >> eval_artifacts/r4_queue4.log

echo "=== bench preview (rung ladder) $(date)" >> eval_artifacts/r4_queue4.log
timeout 3600 python bench.py > eval_artifacts/bench_r4_preview2.json 2>> eval_artifacts/r4_queue4.log
echo "bench_rc=$? $(date)" >> eval_artifacts/r4_queue4.log

touch eval_artifacts/r4_queue4_done.marker
