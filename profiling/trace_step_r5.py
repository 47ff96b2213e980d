"""Device-trace profile of the r5 lever step (hit-ray compaction + period-3).

Where does the time go AFTER hit-ray compaction removed the miss-ray
encode/VJP instances? The r4 trace (finding 33) put the step at 42%
table-grad scatters + 27% encode gathers; both scale with the compacted
hit-ray count now, so the residual mix (importance-sampling budget
evals, searchsorted, per-ray chains, bg) decides the next lever.

Run: python profiling/trace_step_r5.py (chip);
     PROF_SMOKE=1 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python
     profiling/trace_step_r5.py  (CPU validation)
"""

import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ROOT = os.path.join(os.path.dirname(__file__), "..")
OUT = os.path.join(ROOT, "eval_artifacts")
CKPT = os.path.join(OUT, "full_run_ckpt", "full", "30000", "models")
TRACE_DIR = os.path.join(ROOT, "profiling", "trace_r5")


def timeit(fn, *args, n=10, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def parse_perfetto(trace_path, n_steps):
    """Aggregate complete ('X') events per (process, op name).

    Returns {process_name: [(op, total_ms_per_step, count), ...]} sorted
    by total time, plus the full process list for diagnostics.
    """
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    proc_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_name[e["pid"]] = e.get("args", {}).get("name", str(e["pid"]))
    agg = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        # drop python host frames — we want XLA op events
        if name.startswith("$") or ".py:" in name:
            continue
        p = proc_name.get(e.get("pid"), str(e.get("pid")))
        a = agg[p][name]
        a[0] += e.get("dur", 0.0)  # microseconds
        a[1] += 1
    out = {}
    for p, ops in agg.items():
        rows = sorted(
            ((name, round(v[0] / 1e3 / n_steps, 3), v[1]) for name, v in ops.items()),
            key=lambda t: -t[1],
        )
        out[p] = rows
    return out, sorted(proc_name.values())


_OPKIND = re.compile(r"=\s*[\w\[\],<>: ]*?\b([a-z][\w\-]*)\(")


def fusion_op_mix(hlo_text, fusion_names):
    """For each top-level fusion name, the op-kind histogram of its
    fused computation body (best-effort text parse of compiled HLO)."""
    # map fusion instr -> called computation name
    calls = {}
    for m in re.finditer(r"%([\w.\-]+)\s*=\s*[^\n]*fusion\([^\n]*calls=%?([\w.\-]+)", hlo_text):
        calls[m.group(1)] = m.group(2)
    # computation bodies
    bodies = {}
    for m in re.finditer(r"^%?([\w.\-]+)\s+\{", hlo_text, re.M):
        start = m.end()
        depth, i = 1, start
        while i < len(hlo_text) and depth:
            if hlo_text[i] == "{":
                depth += 1
            elif hlo_text[i] == "}":
                depth -= 1
            i += 1
        bodies[m.group(1)] = hlo_text[start:i]
    mixes = {}
    for fn in fusion_names:
        comp = calls.get(fn.lstrip("%"))
        body = bodies.get(comp, "")
        if not body:
            continue
        hist = defaultdict(int)
        for line in body.splitlines():
            m = _OPKIND.search(line)
            if m:
                hist[m.group(1)] += 1
        mixes[fn] = dict(sorted(hist.items(), key=lambda t: -t[1])[:8])
    return mixes


def main():
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

    smoke = bool(int(os.environ.get("PROF_SMOKE", "0")))
    base = tps.PermutoSDFTrainConfig(
        train_lod_top_k=24, train_lod_rand_extra=8, table_grad_alternate=True,
        table_grad_parity=0, table_grad_period=3, hit_ray_frac=0.5,
    )
    if smoke:
        base = dataclasses.replace(
            base, capacity=2 ** 12, nr_levels=8, nr_rays=128,
            render_sample_budget=4096, curvature_sample_budget=512,
            grid_nr_random_samples=4096, grid_update_max_levels=6,
            train_lod_top_k=8, sphere_init_points=512)
    else:
        base = dataclasses.replace(base, nr_rays=1024)
    reel = make_synthetic_reel(nr_views=4, width=100, height=100)
    params = tps.init_params(jax.random.PRNGKey(0), base, reel.nr_images)
    if smoke:
        from permuto_sdf_tpu.ops import occupancy_grid as _og
        ck_grid = _og.make_occupancy_grid(base.grid)
    else:
        # sparse steady-state grid: load the newest r5 flagship/q20 ckpt
        import glob as _glob
        cands = sorted(_glob.glob(os.path.join(
            OUT, "flagship_r5_ckpt", "*", "*", "models")) + _glob.glob(
            os.path.join(OUT, "q20_ckpt", "*", "*", "models")))
        assert cands, "no r5 checkpoint found (run quality_20min_r5 first)"
        print("grid ckpt:", cands[-1], flush=True)
        _, ck_grid = tps.load_from_checkpoint(cands[-1], base)
    it = jnp.asarray(100000)
    key = jax.random.PRNGKey(2)

    results = {}
    N = 3 if smoke else 10

    def step(k):
        return tps._grads_step(params, ck_grid, reel, k, it, base)[0]

    results["step ms"] = round(timeit(step, key, n=N), 1)
    print(f"lever step: {results['step ms']} ms", flush=True)

    # early-vs-late compaction point (the perf_hitcomp_r5 ladder measured
    # LATE; early additionally runs the importance stage's per-ray chains
    # on the hit sub-batch), at 1024 and 2048 rays
    for nr in ((128,) if smoke else (1024, 2048)):
        for mode, early in (("late", False), ("early", True)):
            c = dataclasses.replace(base, nr_rays=nr,
                                    hit_ray_compact_early=early)
            ms = round(timeit(
                lambda k, c=c: tps._grads_step(params, ck_grid, reel, k, it,
                                               c)[0], key, n=N), 1)
            results[f"step ms {mode} @{nr}"] = ms
            print(f"step {mode} @{nr}: {ms} ms", flush=True)

    # ---- device trace of the r5 lever step ----
    os.makedirs(TRACE_DIR, exist_ok=True)
    N_TRACE = 2 if smoke else 10
    keys = [jax.random.fold_in(key, i) for i in range(N_TRACE)]
    jax.block_until_ready(keys)
    jax.block_until_ready(step(keys[0]))  # ensure warm
    with jax.profiler.trace(TRACE_DIR, create_perfetto_trace=True):
        for k in keys:
            out = step(k)
        jax.block_until_ready(out)

    traces = sorted(glob.glob(os.path.join(
        TRACE_DIR, "plugins", "profile", "*", "*.trace.json.gz")))
    if not traces:
        traces = sorted(glob.glob(os.path.join(
            TRACE_DIR, "plugins", "profile", "*", "*.json.gz")))
    trace_info = {}
    if traces:
        per_proc, procs = parse_perfetto(traces[-1], N_TRACE)
        trace_info["processes"] = procs
        # device track = any process whose name mentions TPU/device; else all
        dev = {p: rows for p, rows in per_proc.items()
               if "TPU" in p or "device" in p.lower()}
        if not dev:
            dev = per_proc
        top = {}
        for p, rows in dev.items():
            top[p] = [list(r) for r in rows[:40]]
        trace_info["top_ops_ms_per_step"] = top
        # map the top fusions back to their HLO op mix
        try:
            txt = tps._grads_step.lower(
                params, ck_grid, reel, key, it, base).compile().as_text()
            fus = [r[0] for rows in dev.values() for r in rows[:40]
                   if "fusion" in r[0]]
            trace_info["fusion_op_mix"] = fusion_op_mix(txt, fus[:25])
        except Exception as e:
            trace_info["fusion_op_mix"] = f"unavailable: {e!r}"
    else:
        trace_info["error"] = "no perfetto trace produced"
        print("WARNING: no perfetto trace file found", flush=True)

    results["trace"] = trace_info
    with open(os.path.join(ROOT, "profiling", "trace_top_ops_r5.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "trace"}),
          flush=True)
    # console summary of the top device ops
    for p, rows in trace_info.get("top_ops_ms_per_step", {}).items():
        print(f"--- {p}", flush=True)
        for name, ms, cnt in rows[:25]:
            print(f"  {name:60s} {ms:9.3f} ms/step  x{cnt}", flush=True)


if __name__ == "__main__":
    main()
