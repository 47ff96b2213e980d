#!/bin/bash
# Round-3 TPU queue, re-sized for the post-outage wall-clock budget:
# short guaranteed jobs first (banked evidence), then the flagship
# quality runs right-sized via BG_ITERS/MASK_ITERS so each fits.
set -u
cd /root/repo
LOG=eval_artifacts/r3_tpu_queue.log
echo "=== r3 TPU queue2 start $(date -u) ===" | tee -a "$LOG"

if ! timeout 180 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print('TPU OK:', d)" >>"$LOG" 2>&1; then
  echo "TPU NOT REACHABLE — queue aborted $(date -u)" | tee -a "$LOG"
  exit 1
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "--- [$name] start $(date -u)" | tee -a "$LOG"
  timeout "$tmo" "$@" >>"eval_artifacts/${name}.log" 2>&1
  local rc=$?
  echo "--- [$name] exit=$rc $(date -u)" | tee -a "$LOG"
}

run bench_interactive 900   python eval_artifacts/bench_interactive.py
run perf_lod_eval     1500  python eval_artifacts/perf_lod_eval.py
run perf_occupancy_r3 900   python eval_artifacts/perf_occupancy_r3.py
BG_ITERS=2500   run bg_quality_run   3300 python eval_artifacts/bg_quality_run.py
MASK_ITERS=1200 MASK_MESH_RES=300 run mask_quality_run 1500 python eval_artifacts/mask_quality_run.py
run bench_steady      1200  python bench.py --steps 60

echo "=== r3 TPU queue2 done $(date -u) ===" | tee -a "$LOG"
