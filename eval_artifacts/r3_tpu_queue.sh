#!/bin/bash
# Round-3 TPU job queue (run once the axon tunnel is back).
# Short/guaranteed jobs first, then the two flagship quality runs.
# Each job is timeout-bounded and logged; a failure does not stop the queue.
# Usage: bash eval_artifacts/r3_tpu_queue.sh [BG_ITERS] [MASK_ITERS]
set -u
cd /root/repo
BG_ITERS="${1:-20000}"
MASK_ITERS="${2:-12000}"
LOG=eval_artifacts/r3_tpu_queue.log
echo "=== r3 TPU queue start $(date -u) BG_ITERS=$BG_ITERS MASK_ITERS=$MASK_ITERS ===" | tee -a "$LOG"

# Abort early if the chip is not actually reachable.
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

# one short job first (proves the tunnel end-to-end, warms caches), then
# the two flagship quality runs (the critical evidence), then the rest
run bench_interactive 2400  python eval_artifacts/bench_interactive.py
# measured rate on the real chip: ~0.72-0.77 s/iter steady state (bg run
# log, post-11k) — grant 1 s/iter + 2 h of compile/eval/contention headroom
BG_ITERS=$BG_ITERS    run bg_quality_run   $(( BG_ITERS + 7200 ))  python eval_artifacts/bg_quality_run.py
MASK_ITERS=$MASK_ITERS run mask_quality_run $(( MASK_ITERS + 7200 )) python eval_artifacts/mask_quality_run.py
run perf_lod_eval     3600  python eval_artifacts/perf_lod_eval.py
run perf_occupancy_r3 1800  python eval_artifacts/perf_occupancy_r3.py
run bench_steady      2400  python bench.py --steps 60

echo "=== r3 TPU queue done $(date -u) ===" | tee -a "$LOG"
