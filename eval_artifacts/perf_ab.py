"""Full-scale step-time A/B: old path (reverse-mode grads, no proxy) vs
new defaults (forward-mode grads + coarse-level proxy). Run on real TPU."""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

reel = make_synthetic_reel(nr_views=4, width=100, height=100)

def step_time(cfg, n=20):
    params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
    optimizer = tps.make_optimizer(cfg)
    opt_state = optimizer.init(params)
    grid = og.make_occupancy_grid(cfg.grid)
    it = jnp.asarray(cfg.nr_iter_sphere_fit + 100)
    key = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    key, k = jax.random.split(key)
    out = tps.train_step(params, opt_state, grid, reel, k, it, cfg, optimizer)
    jax.block_until_ready(out[2]); compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(n):
        key, k = jax.random.split(key)
        out = tps.train_step(params, opt_state, grid, reel, k, it, cfg, optimizer)
    jax.block_until_ready(out[2])
    return (time.perf_counter() - t0) / n, compile_s

variants = {
    "old (reverse grad, full-level proxy)": dict(imp_sampling_max_levels=None, grad="reverse"),
    "proxy only": dict(imp_sampling_max_levels=16, grad="reverse"),
    "fwd grad only": dict(imp_sampling_max_levels=None, grad="forward"),
    "new defaults (fwd grad + proxy16)": dict(imp_sampling_max_levels=16, grad="forward"),
}
for name, v in variants.items():
    cfg = tps.PermutoSDFTrainConfig(imp_sampling_max_levels=v["imp_sampling_max_levels"],
                                    sdf_gradient_mode=v["grad"])
    s, c = step_time(cfg)
    print(f"{name:45s}: {s*1000:8.1f} ms/step  (compile {c:.0f}s)", flush=True)

import sys as _s; _s.exit(0)
# fused single-jit step with the new defaults — does forward mode avoid the
# optimizer-fusion pathology (PERFORMANCE.md finding 5)?
import functools
cfg = tps.PermutoSDFTrainConfig()
optimizer = tps.make_optimizer(cfg)

@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def fused_step(params, opt_state, grid, reel, key, it, cfg):
    loss, aux, grads = tps.compute_loss_and_grads(params, grid, reel, key, it, cfg)
    params, opt_state = tps.apply_updates(params, opt_state, grads, it, cfg, optimizer)
    return params, opt_state, loss, aux

params = tps.init_params(jax.random.PRNGKey(0), cfg, reel.nr_images)
opt_state = optimizer.init(params)
grid = og.make_occupancy_grid(cfg.grid)
it = jnp.asarray(cfg.nr_iter_sphere_fit + 100)
key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
key, k = jax.random.split(key)
params, opt_state, loss, aux = fused_step(params, opt_state, grid, reel, k, it, cfg)
jax.block_until_ready(loss); print(f"fused compile {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter(); n = 20
for _ in range(n):
    key, k = jax.random.split(key)
    params, opt_state, loss, aux = fused_step(params, opt_state, grid, reel, k, it, cfg)
jax.block_until_ready(loss)
print(f"{'fused single-jit (fwd grad + proxy16)':45s}: {(time.perf_counter()-t0)/n*1000:8.1f} ms/step", flush=True)
