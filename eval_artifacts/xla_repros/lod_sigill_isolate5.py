"""Round 5: which params leaf, arriving as a program PARAMETER, triggers
the stage-1 priority-fusion SIGILL? Bisect by closing over subsets of the
params tree (the rest stay arguments), plus try compiler_options escapes.

Production implication: at eval time params are a fixed checkpoint, so a
leaf that must be constant can simply be captured by the jit closure (one
retrace per checkpoint load).
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
                         "err": msg[:200]}
    print(name, json.dumps(results[name]), flush=True)
    with open("/root/repo/eval_artifacts/xla_repros/"
              "lod_sigill_isolate5.json", "w") as f:
        json.dump(results, f, indent=1)


def stage1_with(const_keys):
    """jit with params[k] for k in const_keys captured as constants and the
    remaining top-level entries passed as arguments."""
    const = {k: v for k, v in params.items() if k in const_keys}
    var = {k: v for k, v in params.items() if k not in const_keys}

    @jax.jit
    def f(var, grid, origins, dirs):
        p = {**const, **var}
        return tps._lod_coarse_select(p, grid, origins, dirs, IT, COS, FV,
                                      cfg=cfg, coarse_levels=12, top_k=32)

    return lambda: f(var, grid, origins, dirs)


print("top-level params keys:", list(params.keys()), flush=True)

attempt("const_sdf_only", stage1_with({"sdf"}))
if not results["const_sdf_only"]["ok"]:
    attempt("const_all", stage1_with(set(params.keys())))
else:
    # narrower: only the sdf ENCODING tables constant, sdf mlp as args
    sdf_enc_const = {"encoding": params["sdf"]["encoding"]}

    @jax.jit
    def f2(var_sdf_rest, var_other, grid, origins, dirs):
        p = {**var_other,
             "sdf": {**var_sdf_rest, "encoding": sdf_enc_const["encoding"]}}
        return tps._lod_coarse_select(p, grid, origins, dirs, IT, COS, FV,
                                      cfg=cfg, coarse_levels=12, top_k=32)

    var_sdf_rest = {k: v for k, v in params["sdf"].items() if k != "encoding"}
    var_other = {k: v for k, v in params.items() if k != "sdf"}
    attempt("const_sdf_encoding_only",
            lambda: f2(var_sdf_rest, var_other, grid, origins, dirs))

# compiler_options escape hatches with params fully as arguments
for flag, val in [
    ("xla_tpu_use_priority_fusion", "false"),
    ("xla_tpu_enable_priority_fusion", "false"),
    ("xla_priority_fusion", "false"),
]:
    def run(flag=flag, val=val):
        lowered = tps._lod_coarse_jit.lower(
            params, grid, origins, dirs, IT, COS, FV, cfg, 12, 32)
        ex = lowered.compile(compiler_options={flag: val})
        out = ex(params, grid, origins, dirs, IT, COS, FV)
        return out
    attempt(f"args_flag_{flag}", run)
    if results[f"args_flag_{flag}"]["ok"]:
        break

print(json.dumps(results), flush=True)
