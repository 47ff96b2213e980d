"""Stage-level breakdown of the flagship train step on real TPU.

Measures (by ablation differences) where the ~737 ms/step goes:
encode fwd, sampling stage, curvature double-backprop, bg model,
occupancy update, optimizer. Run: python profiling/profile_step.py
"""

import os
import time
import json
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import dataclasses


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


def main():
    from permuto_sdf_tpu.train import train_permuto_sdf as tps
    from permuto_sdf_tpu.ops import occupancy_grid as og
    from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel
    from permuto_sdf_tpu.models.fields import sdf_apply, sdf_with_gradient

    cfg = tps.PermutoSDFTrainConfig()
    reel = make_synthetic_reel(nr_views=4, width=100, height=100)
    params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
    optimizer = tps.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    grid = og.make_occupancy_grid(cfg.grid)
    key = jax.random.PRNGKey(1)
    it = jnp.asarray(cfg.nr_iter_sphere_fit + 100)

    results = {}

    def step_time(cfg_v, label):
        k = jax.random.PRNGKey(2)
        f = lambda: tps._grads_step(params, grid, reel, k, it, cfg_v)[0]
        ms = timeit(f, n=10)
        results[label] = round(ms, 1)
        print(f"{label:45s} {ms:8.1f} ms", flush=True)
        return ms

    # full gradient graph
    step_time(cfg, "grads: full")
    # ablations
    step_time(dataclasses.replace(cfg, enable_curvature=False), "grads: -curvature")
    step_time(dataclasses.replace(cfg, with_mask=True), "grads: -bg (mask mode)")
    step_time(dataclasses.replace(cfg, do_importance_sampling=False),
              "grads: -importance sampling")
    step_time(dataclasses.replace(cfg, enable_curvature=False, with_mask=True,
                                  do_importance_sampling=False),
              "grads: -curv -bg -is")
    step_time(dataclasses.replace(cfg, enable_eikonal=False,
                                  enable_curvature=False),
              "grads: -eik -curv (no double backprop)")

    # update step
    grads_out = tps._grads_step(params, grid, reel, jax.random.PRNGKey(2), it, cfg)
    ms = timeit(lambda: tps._update_step(params, opt_state, grads_out[2], it,
                                         cfg, optimizer)[1], n=10)
    results["update step"] = round(ms, 1)
    print(f"{'update step':45s} {ms:8.1f} ms", flush=True)

    # occupancy update
    ms = timeit(lambda: tps.occupancy_update(params, grid, jax.random.PRNGKey(3),
                                             it, jnp.asarray(64.0), cfg), n=5)
    results["occupancy update (full, every 8)"] = round(ms, 1)
    print(f"{'occupancy update':45s} {ms:8.1f} ms", flush=True)

    # raw encode costs at the step's sample count
    N = cfg.nr_rays * (cfg.max_nr_samples_per_ray + 2 * cfg.nr_samples_imp_sampling)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (N, 3), minval=-0.4, maxval=0.4)

    @jax.jit
    def enc_fwd(p, pts):
        return sdf_apply(p["sdf"], pts, it, cfg.sdf_model)[0].sum()

    ms = timeit(enc_fwd, params, pts, n=10)
    results[f"sdf_apply fwd ({N} pts)"] = round(ms, 1)
    print(f"{'sdf_apply fwd':45s} {ms:8.1f} ms", flush=True)

    # NOTE: a standalone grad(sdf_apply)-wrt-params microbench SIGILL-crashes
    # the XLA:TPU compiler (the finding-5 fusion cost model defect) — skipped.

    @jax.jit
    def enc_gradpts(p, pts):
        return sdf_with_gradient(p["sdf"], pts, it, cfg.sdf_model)[1].sum()

    ms = timeit(enc_gradpts, params, pts, n=10)
    results["sdf_with_gradient fwd"] = round(ms, 1)
    print(f"{'sdf_with_gradient fwd':45s} {ms:8.1f} ms", flush=True)

    @jax.jit
    def enc_doublebwd(p, pts):
        def eik(q):
            g = sdf_with_gradient(q["sdf"], pts, it, cfg.sdf_model)[1]
            return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()
        return jax.grad(eik)(p)

    ms = timeit(lambda: enc_doublebwd(params, pts)["sdf"]["encoding"]["lattice_values"], n=10)
    results["grad(eikonal) double backprop"] = round(ms, 1)
    print(f"{'grad(eikonal) double backprop':45s} {ms:8.1f} ms", flush=True)

    with open(os.path.join(os.path.dirname(__file__), "breakdown.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
