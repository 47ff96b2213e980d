"""Chip step-timing ladder: hit-ray compaction x table-grad period (r5).

The finding-33 trace puts the step's cost in table-grad scatters (42%)
and encode gathers (27%), both proportional to the number of rays whose
LOD-selected slots pay full-resolution SDF+RGB encode/VJP. At the bench
steady state only ~30% of sampled rays hit occupied space, so hit-ray
compaction (train_permuto_sdf.py::PermutoSDFTrainConfig.hit_ray_frac)
should cut those instance counts ~1/hit_frac; table-grad period p cuts
the scatter half a further (2/p)x vs the period-2 default.

Protocol (ADVICE r4 fixes baked in):
- full run is the DEFAULT; PP_SMOKE=1 writes to *_smoke.json so a sanity
  run can never overwrite flagship evidence;
- the JSON carries full provenance (smoke flag, levers, small-cfg dict,
  warmup config, per-point ray counts);
- timings cover _grads_step + _update_step together (the real per-iter
  dispatch pair), with the occupancy update reported separately.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS='' \
    python eval_artifacts/perf_hitcomp_r5.py
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
OUT_JSON = os.path.join(
    OUT, "perf_hitcomp_r5_smoke.json" if SMOKE else "perf_hitcomp_r5.json")

levers = dict(train_lod_top_k=24, train_lod_rand_extra=8,
              table_grad_alternate=True)
small = {}
if SMOKE:
    small = dict(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                 render_sample_budget=4096, curvature_sample_budget=512,
                 grid_nr_random_samples=4096, grid_update_max_levels=6,
                 train_lod_top_k=8, sphere_init_points=512)

# warmup mirrors bench.py's operating-point recipe (300 sphere + 1200
# train, variance anneal finishing at 600) so the measured state carries
# the bench's ~2% band occupancy — a 700-iter warmup leaves the grid at
# ~33% occupied (measured 2026-08-20), which overstates the hit fraction
# and understates the compaction levers (the r4 period script had the
# same flaw, ADVICE r4 medium).
NWARM = 60 if SMOKE else 1500
cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=20 if SMOKE else 300,
    forced_variance_finish_iter=30 if SMOKE else 600,
    sdf_nr_iters_for_c2f=20 if SMOKE else 400,
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

optimizer = tps.make_optimizer(cfg)
opt_state = optimizer.init(params)
key = jax.random.PRNGKey(2)
it = jnp.asarray(NWARM * 4)  # well past every anneal


def timeit(fn, n=10, reps=3):
    o = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def step_ms(c):
    """Mean full-step time (grads + optimizer update dispatch pair) over
    the alternation parities of c.table_grad_period."""
    ms = []
    for parity in range(c.table_grad_period if c.table_grad_alternate else 1):
        # parity must stay None when alternation is off — a leaked 0 would
        # silently measure the half-level parity-0 graph (the 2026-08-20
        # run's "p1" row has exactly this bug; ignore it there)
        cp = dataclasses.replace(
            c, table_grad_parity=parity if c.table_grad_alternate else None)

        def one(cp=cp):
            _, aux, grads = tps._grads_step(params, grid, reel, key, it, cp)
            p2, o2 = tps._update_step(params, opt_state, grads, it, cp,
                                      optimizer)
            return aux["nr_samples"], p2
        ms.append(timeit(one))
    return sum(ms) / len(ms)


out = {
    "smoke": SMOKE,
    "protocol": "grads+update dispatch pair, best-of-3 x10, parity-avg",
    "warmup_iters": NWARM,
    "levers": levers, "small": small,
    "grid_occupancy_frac": round(float(jnp.mean(grid.occupancy)), 4),
    "by_rays": {},
}

for nr_rays in ((128,) if SMOKE else (1024, 2048)):
    rows = {}
    c0 = dataclasses.replace(cfg, nr_rays=nr_rays)
    # measured hit statistics at this operating point (10 batches)
    hits, hitrays = [], []
    for i in range(10):
        k = jax.random.fold_in(key, i)
        _, aux, _ = tps._grads_step(
            params, grid, reel, k, it,
            dataclasses.replace(c0, table_grad_parity=0))
        hits.append(float(aux["nr_samples"]))
        hitrays.append(float(aux["nr_hit_rays"]))
    rows["mean_valid_samples"] = round(float(np.mean(hits)))
    rows["mean_hit_rays"] = round(float(np.mean(hitrays)), 1)
    rows["hit_frac"] = round(float(np.mean(hitrays)) / nr_rays, 3)

    grads_ladder = {
        "p2": dict(table_grad_period=2),
        "p2_hc50": dict(table_grad_period=2, hit_ray_frac=0.5),
        "p3": dict(table_grad_period=3),
        "p3_hc50": dict(table_grad_period=3, hit_ray_frac=0.5),
        "p3_hc375": dict(table_grad_period=3, hit_ray_frac=0.375),
        "p4_hc50": dict(table_grad_period=4, hit_ray_frac=0.5),
        "p1": dict(table_grad_alternate=False),
    }
    for name, kw in grads_ladder.items():
        c = dataclasses.replace(c0, **kw)
        try:
            rows[name] = round(step_ms(c), 1)
        except Exception as e:
            rows[name] = f"ERROR: {e!r}"[:300]
        print(f"rays={nr_rays} {name}: {rows[name]} ms", flush=True)
        out["by_rays"][str(nr_rays)] = rows
        with open(OUT_JSON, "w") as f:
            json.dump(out, f, indent=1)

# occupancy update cost (amortized every grid_update_every=8 iters)
upd_ms = timeit(lambda: tps.occupancy_update(
    params, grid, key, it, jnp.asarray(float(np.exp(8.0))), cfg), n=5)
out["occupancy_update_ms"] = round(upd_ms, 1)
with open(OUT_JSON, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
