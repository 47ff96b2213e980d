"""Chip step-timing A/B: table-grad alternation period 1/2/3/4.

The finding-33 device trace shows the table-grad scatter-adds are the
largest step slice (89 of 213 ms at 1024 rays, period 2). Period p
emits backward scatters for nr_levels/p levels per step (each level's
table updates every p-th step), so scatter cost falls ~1/p while the
forward gathers are untouched. This measures the step at periods
1 (no alternation), 2 (r4 default), 3 and 4, on a REPRESENTATIVE
state: a short flagship-scale warmup on the bench scene (finding 32,
~1.6% band occupancy) with compressed anneals, exactly the operating
point bench.py measures at.

Writes eval_artifacts/perf_period_r4.json. Quality is a separate A/B
(quality_ab_r4_period3.py) — this file is speed only.

Smoke: PP_SMOKE=1 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS='' \
    python eval_artifacts/perf_period_r4.py
"""
import sys, os, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import (bench_scene_sdf,
                                                make_synthetic_reel)

OUT = "/root/repo/eval_artifacts"
SMOKE = bool(os.environ.get("PP_SMOKE"))

levers = dict(train_lod_top_k=24, train_lod_rand_extra=8,
              table_grad_alternate=True)
small = {}
if SMOKE:
    small = dict(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                 render_sample_budget=4096, curvature_sample_budget=512,
                 grid_nr_random_samples=4096, grid_update_max_levels=6,
                 train_lod_top_k=8, sphere_init_points=512)

NWARM = 60 if SMOKE else 700
cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=20 if SMOKE else 200,
    forced_variance_finish_iter=30 if SMOKE else 400,
    sdf_nr_iters_for_c2f=20 if SMOKE else 300,
    iter_finish_training=NWARM,
    warmup_iters=20 if SMOKE else 100,
    **{**levers, **small},
)
reel = make_synthetic_reel(nr_views=4, width=100, height=100,
                           sdf_fn=bench_scene_sdf, fov_deg=45.0)

t0 = time.perf_counter()
params, grid, _ = tps.train(reel, cfg, nr_iters=NWARM, log_every=200)
print(f"warmup train: {time.perf_counter()-t0:.0f}s, "
      f"grid occ {float(jnp.mean(grid.occupancy)):.4f}", flush=True)

key = jax.random.PRNGKey(2)
it = jnp.asarray(NWARM * 4)  # well past every anneal


def timeit(fn, n=10, reps=3):
    o = fn(); jax.block_until_ready(o)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


out = {"warmup_iters": NWARM,
       "grid_occupancy_frac": round(float(jnp.mean(grid.occupancy)), 4),
       "by_rays": {}}
for nr_rays in ((128,) if SMOKE else (1024, 2048)):
    rows = {}
    for period in (1, 2, 3, 4):
        ms = []
        for parity in range(period):
            c = dataclasses.replace(
                cfg, nr_rays=nr_rays, table_grad_alternate=True,
                table_grad_period=period, table_grad_parity=parity)
            ms.append(timeit(
                lambda c=c: tps._grads_step(params, grid, reel, key, it, c)[0]))
        rows[f"period{period}"] = round(sum(ms) / len(ms), 1)
        print(f"rays={nr_rays} period={period}: {rows[f'period{period}']} ms "
              f"(parities {[round(m,1) for m in ms]})", flush=True)
    out["by_rays"][str(nr_rays)] = rows
    with open(os.path.join(OUT, "perf_period_r4.json"), "w") as f:
        json.dump(out, f, indent=1)

print(json.dumps(out), flush=True)
