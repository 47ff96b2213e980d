"""Round-4 step-time A/B at flagship scale on the real TPU: the
instance-count levers built for VERDICT r3 item 1.

  row     — row-2 f32 table gathers (roofline2: 4.29 vs 7.12 ns/inst)
  lod     — train-time LOD: full-resolution SDF-grad+RGB only at the
            top-24 (+8 random) samples/ray ranked by the carried IS sdf
  par     — alternating-level table gradients (half the backward
            scatters per step; every level updates every 2nd step)
  c2f     — c2f-front level skipping (early-training only; measured at
            the it=100 operating point where 12/24 SDF levels are open)
  isp     — importance-sampling proxy at 12 levels (re-A/B after row)

Methodology of perf_ab_r3.py: key split per step (the axon transport
dedupes identical dispatches), 3 windows x n steps, min window; parity
variants alternate two compiled graphs exactly like train() does.
Writes eval_artifacts/perf_ab_r4.json.
"""
import sys, json, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses
import jax.numpy as jnp
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

reel = make_synthetic_reel(nr_views=4, width=100, height=100)


def step_time(cfg, n=15, alternate=False):
    params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
    optimizer = tps.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    grid = og.make_occupancy_grid(cfg.grid)
    it = jnp.asarray(cfg.nr_iter_sphere_fit + 100)
    cfgs = ([dataclasses.replace(cfg, table_grad_parity=p) for p in (0, 1)]
            if alternate else [cfg])
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for c in cfgs:
        key, k = jax.random.split(key)
        out = tps.train_step(params, opt_state, grid, reel, k, it, c,
                             optimizer)
    jax.block_until_ready(out[2]); compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            key, k = jax.random.split(key)
            out = tps.train_step(params, opt_state, grid, reel, k, it,
                                 cfgs[i % len(cfgs)], optimizer)
        jax.block_until_ready(out[2])
        w = (time.perf_counter() - t0) / n
        best = w if best is None else min(best, w)
    return best, compile_s


ROW = dict(table_row_gather=True)
NOROW = dict(table_row_gather=False)
LOD = dict(train_lod_top_k=24, train_lod_rand_extra=8)
variants = [
    ("r3 baseline (packed bf16)", dict(**NOROW), False),
    ("row", dict(**ROW), False),
    ("row+lod", dict(**ROW, **LOD), False),
    ("row+par", dict(**ROW, table_grad_alternate=True), True),
    ("row+lod+par", dict(**ROW, **LOD, table_grad_alternate=True), True),
    ("row+lod+par+isp12", dict(**ROW, **LOD, table_grad_alternate=True,
                               imp_sampling_max_levels=12), True),
    ("row+lod+par+c2f@12lvl", dict(**ROW, **LOD, table_grad_alternate=True,
                                   sdf_active_levels=12), True),
    ("row+lod16+par", dict(**ROW, train_lod_top_k=16, train_lod_rand_extra=8,
                           table_grad_alternate=True), True),
]
out = {}
for name, kw, alt in variants:
    cfg = tps.PermutoSDFTrainConfig(**kw)
    s, c = step_time(cfg, alternate=alt)
    out[name] = {"ms_per_step": round(s * 1e3, 1), "compile_s": round(c, 1)}
    print(f"{name:32s}: {s*1000:8.1f} ms/step  (compile {c:.0f}s)", flush=True)

with open("/root/repo/eval_artifacts/perf_ab_r4.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote eval_artifacts/perf_ab_r4.json", flush=True)
