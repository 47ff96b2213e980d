#!/bin/bash
# COLD-cache bench run (VERDICT r4 item 2 evidence): point the persistent
# compilation cache at an empty directory so every graph compiles from
# scratch, with the background AOT precompiler racing the main loop.
# Success bar: cold warmup_s < 300 AND compile events after iter 0 ~ 0
# on the (separate) warm run. Writes bench_r5_cold.json; the throwaway
# cache is deleted afterwards.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_cold_r5
rm -rf "$JAX_COMPILATION_CACHE_DIR"; mkdir -p "$JAX_COMPILATION_CACHE_DIR"
timeout 10800 python -u bench.py > eval_artifacts/bench_r5_cold.json.tmp \
  2> eval_artifacts/bench_r5_cold.log
rc=$?
tail -1 eval_artifacts/bench_r5_cold.json.tmp > eval_artifacts/bench_r5_cold.json
echo "cold bench rc=$rc" >> eval_artifacts/bench_r5_cold.log
rm -rf "$JAX_COMPILATION_CACHE_DIR"
