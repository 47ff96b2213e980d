"""Isolate the XLA:TPU priority-fusion SIGILL in the LOD eval render
(PERFORMANCE.md finding 20): compile each stage and candidate sub-graphs
separately at flagship scale and report which ones crash the compiler.

In this environment compiles run in a helper subprocess, so the SIGILL
surfaces as a catchable JaxRuntimeError; on a standard TPU host it kills
the process — which is why production never dispatches a known-crashing
shape (render_image memoizes failures and falls back to exact).
"""
import sys, json, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import functools
import jax.numpy as jnp
import numpy as np
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.models.fields import sdf_apply, sdf_with_gradient
from permuto_sdf_tpu.datasets import synthetic as syn

CKPT = "/root/repo/eval_artifacts/full_run_ckpt/full/30000/models"
cfg = tps.PermutoSDFTrainConfig(render_sample_budget=None)
params, grid = tps.load_from_checkpoint(CKPT, cfg)
Kv, tfv = syn.spiral_camera(8.5, 100, 100, 1.3, 32.0, 24)
from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame
origins, dirs = rays_from_frame(Kv, tfv, 100, 100)
origins, dirs = origins[:2048], dirs[:2048]
IT, COS, FV = 9_999_999, 1.0, 0.8
results = {}


def attempt(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out)[0])
        results[name] = {"ok": True, "s": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        msg = repr(e)
        results[name] = {"ok": False,
                         "sigill": "SIGILL" in msg,
                         "err": msg[:160]}
    print(name, json.dumps(results[name]), flush=True)


# stage 1 and 2 as production dispatches them
attempt("stage1_coarse_select", lambda: tps._lod_coarse_jit(
    params, grid, origins, dirs, IT, COS, FV, cfg, 12, 32))

mid = None
if results["stage1_coarse_select"]["ok"]:
    mid = tps._lod_coarse_jit(params, grid, origins, dirs, IT, COS, FV,
                              cfg, 12, 32)
    attempt("stage2_fine_render", lambda: tps._lod_fine_jit(
        params, mid, origins, dirs, IT, COS, FV, cfg))

# sub-graphs of stage 1
sdf_cfg = cfg.sdf_model
pts = jnp.asarray(np.random.RandomState(0).uniform(-0.4, 0.4,
                                                   (2048 * 96, 3)),
                  jnp.float32)

attempt("coarse_sdf_apply_max_levels12", jax.jit(
    lambda: sdf_apply(params["sdf"], pts, IT, sdf_cfg, max_levels=12)[0]))

attempt("coarse_sdf_grad_max_levels12", jax.jit(
    lambda: jax.grad(lambda p: sdf_apply(params["sdf"], p, IT, sdf_cfg,
                                         max_levels=12)[0].sum())(pts)))

attempt("full_sdf_with_gradient", jax.jit(
    lambda: sdf_with_gradient(params["sdf"], pts[:65536], IT, sdf_cfg)[1]))


def samples_plus_coarse():
    _, t_entry, _, t_exit, _ = tps.BOUND.ray_intersection(origins, dirs)
    samples = tps._create_fg_samples(params, grid, jax.random.PRNGKey(0),
                                     origins, dirs, t_entry, t_exit, IT,
                                     cfg, jitter=False)
    sdf_c = sdf_apply(params["sdf"], samples.flat_positions(), IT,
                      sdf_cfg, max_levels=12)[0]
    return sdf_c


attempt("samples_plus_coarse_sdf", jax.jit(samples_plus_coarse))


def samples_plus_coarse_grad():
    _, t_entry, _, t_exit, _ = tps.BOUND.ray_intersection(origins, dirs)
    samples = tps._create_fg_samples(params, grid, jax.random.PRNGKey(0),
                                     origins, dirs, t_entry, t_exit, IT,
                                     cfg, jitter=False)
    pos = samples.flat_positions()
    g = jax.grad(lambda p: sdf_apply(params["sdf"], p, IT, sdf_cfg,
                                     max_levels=12)[0].sum())(pos)
    return g


attempt("samples_plus_coarse_grad", jax.jit(samples_plus_coarse_grad))

with open("/root/repo/eval_artifacts/xla_repros/lod_sigill_isolate.json",
          "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results), flush=True)
