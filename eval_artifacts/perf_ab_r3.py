"""Round-3 step-time A/B at flagship scale on real TPU:
sorted-scatter VJP for the packed hash-table gathers (finding 18).
Prints ms/step per variant; key is split per step so no two dispatches
are identical (axon dedupes identical repeated calls)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

reel = make_synthetic_reel(nr_views=4, width=100, height=100)


def step_time(cfg, n=15):
    params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
    optimizer = tps.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    grid = og.make_occupancy_grid(cfg.grid)
    it = jnp.asarray(cfg.nr_iter_sphere_fit + 100)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    key, k = jax.random.split(key)
    out = tps.train_step(params, opt_state, grid, reel, k, it, cfg, optimizer)
    jax.block_until_ready(out[2]); compile_s = time.perf_counter() - t0
    best = None
    for _ in range(3):  # 3 windows, report min (contended host)
        t0 = time.perf_counter()
        for _ in range(n):
            key, k = jax.random.split(key)
            out = tps.train_step(params, opt_state, grid, reel, k, it, cfg,
                                 optimizer)
        jax.block_until_ready(out[2])
        w = (time.perf_counter() - t0) / n
        best = w if best is None else min(best, w)
    return best, compile_s


variants = {
    "r2 settled (cb16384)": dict(),
    "sorted_scatter": dict(sorted_scatter=True),
}
for name, v in variants.items():
    cfg = tps.PermutoSDFTrainConfig(**v)
    s, c = step_time(cfg)
    print(f"{name:40s}: {s*1000:8.1f} ms/step  (compile {c:.0f}s)", flush=True)
