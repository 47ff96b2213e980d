"""Round 4: production stage-1 dispatch (params as ARGUMENTS) after the
one-vjp-traversal rewrite of _lod_coarse_select. If this compiles, the
two-program LOD eval path works on the chip and perf_lod_eval can land.
"""
import sys, json, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame

CKPT = "/root/repo/eval_artifacts/full_run_ckpt/full/30000/models"
cfg = tps.PermutoSDFTrainConfig(render_sample_budget=None)
params, grid = tps.load_from_checkpoint(CKPT, cfg)
Kv, tfv = syn.spiral_camera(8.5, 100, 100, 1.3, 32.0, 24)
origins, dirs = rays_from_frame(Kv, tfv, 100, 100)
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
    with open("/root/repo/eval_artifacts/xla_repros/"
              "lod_sigill_isolate4.json", "w") as f:
        json.dump(results, f, indent=1)


attempt("prod_stage1_vjp_2048", lambda: tps._lod_coarse_jit(
    params, grid, origins[:2048], dirs[:2048], IT, COS, FV, cfg, 12, 32))
if results["prod_stage1_vjp_2048"]["ok"]:
    mid = tps._lod_coarse_jit(params, grid, origins[:2048], dirs[:2048],
                              IT, COS, FV, cfg, 12, 32)
    attempt("prod_stage2_2048", lambda: tps._lod_fine_jit(
        params, mid, origins[:2048], dirs[:2048], IT, COS, FV, cfg))
    # end-to-end through the public entry
    attempt("render_rays_eval_lod_e2e", lambda: tps.render_rays_eval_lod(
        params, grid, origins[:2048], dirs[:2048], IT, COS, FV, cfg,
        coarse_levels=12, top_k=32))
print(json.dumps(results), flush=True)
