#!/bin/bash
# Round-4 chip queue #2: finish ST A/B, flagship lod16 A/B, bench preview.
set -x
cd /root/repo
echo "=== ST r4b $(date)" >> eval_artifacts/r4_queue2.log
timeout 3600 python eval_artifacts/bench_st_1080p_r4b.py >> eval_artifacts/r4_queue2.log 2>&1
echo "st_rc=$? $(date)" >> eval_artifacts/r4_queue2.log
echo "=== lod16 A/B $(date)" >> eval_artifacts/r4_queue2.log
timeout 7200 python eval_artifacts/quality_ab_r4_lod16_chip.py >> eval_artifacts/r4_queue2.log 2>&1
echo "lod16_rc=$? $(date)" >> eval_artifacts/r4_queue2.log
echo "=== bench preview $(date)" >> eval_artifacts/r4_queue2.log
timeout 3600 python bench.py > eval_artifacts/bench_r4_preview.json 2>> eval_artifacts/r4_queue2.log
echo "bench_rc=$? $(date)" >> eval_artifacts/r4_queue2.log
touch eval_artifacts/r4_queue2_done.marker
