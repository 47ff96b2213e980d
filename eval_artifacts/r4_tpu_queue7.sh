#!/bin/bash
# Round-4 chip queue #7: table-grad period 2-vs-3 A/B (step timing +
# equal-iteration quality), then a refreshed 12k-iter flagship quality
# run on the full shipping defaults (isp12/curv8192/lvl14/compare_all).
cd /root/repo
while [ ! -f eval_artifacts/r4_queue6_done.marker ]; do sleep 60; done

echo "=== quality_ab_r4_period3 $(date)" >> eval_artifacts/r4_queue7.log
timeout 7200 python eval_artifacts/quality_ab_r4_period3.py >> eval_artifacts/r4_queue7.log 2>&1
echo "p3_ab_rc=$? $(date)" >> eval_artifacts/r4_queue7.log

echo "=== mask_quality_run refresh (12k iters, shipping defaults) $(date)" >> eval_artifacts/r4_queue7.log
MASK_LEVERS=1 MASK_ITERS=12000 timeout 7200 python eval_artifacts/mask_quality_run_r4b.py >> eval_artifacts/r4_queue7.log 2>&1
echo "mask_rc=$? $(date)" >> eval_artifacts/r4_queue7.log

touch eval_artifacts/r4_queue7_done.marker
