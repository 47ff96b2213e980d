#!/bin/bash
# Round-4 chip queue #6: bench with finding-30 defaults + finding-32
# scene (also warms the persistent cache for the driver's final bench),
# then the 20-minute time-boxed flagship quality run (BASELINE anchor).
cd /root/repo

echo "=== bench (new defaults + bench scene) $(date)" >> eval_artifacts/r4_queue6.log
timeout 5400 python bench.py > eval_artifacts/bench_r4_preview3.json 2>> eval_artifacts/r4_queue6.log
echo "bench_rc=$? $(date)" >> eval_artifacts/r4_queue6.log
cat eval_artifacts/bench_r4_preview3.json >> eval_artifacts/r4_queue6.log

echo "=== quality_20min_r4 $(date)" >> eval_artifacts/r4_queue6.log
timeout 5400 python eval_artifacts/quality_20min_r4.py >> eval_artifacts/r4_queue6.log 2>&1
echo "q20_rc=$? $(date)" >> eval_artifacts/r4_queue6.log

touch eval_artifacts/r4_queue6_done.marker
