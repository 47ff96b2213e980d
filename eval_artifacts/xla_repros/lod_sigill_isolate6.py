"""Round 6: can an optimization_barrier (fusion fence) dodge the stage-1
priority-fusion SIGILL while keeping ALL params as program arguments?
Also: is the tiny sdf MLP (not the 50 MB tables) the leaf that must be
constant? (Round 5: sdf fully const -> ok; tables-const+mlp-args -> crash.)
"""
import sys, json, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.models.fields import sdf_apply
from permuto_sdf_tpu.ops import volume_rendering as vr
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.tensor_reel import rays_from_frame

CKPT = "/root/repo/eval_artifacts/full_run_ckpt/full/30000/models"
cfg = tps.PermutoSDFTrainConfig(render_sample_budget=None)
params, grid = tps.load_from_checkpoint(CKPT, cfg)
Kv, tfv = syn.spiral_camera(8.5, 100, 100, 1.3, 32.0, 24)
origins, dirs = rays_from_frame(Kv, tfv, 100, 100)
origins, dirs = origins[:2048], dirs[:2048]
IT, COS, FV = 9_999_999, 1.0, 0.8
CL, TK = 12, 32
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
              "lod_sigill_isolate6.json", "w") as f:
        json.dump(results, f, indent=1)


def stage1_barrier(where):
    @jax.jit
    def f(params, grid, origins, dirs):
        _, t_entry, _, t_exit, _ = tps.BOUND.ray_intersection(origins, dirs)
        samples = tps._create_fg_samples(params, grid, jax.random.PRNGKey(0),
                                         origins, dirs, t_entry, t_exit, IT,
                                         cfg, jitter=False)
        if where in ("samples", "both"):
            samples = jax.lax.optimization_barrier(samples)
        R, S = samples.mask.shape
        pos = samples.flat_positions()
        K = min(TK, S)
        sdf_c_2d, vjp_fn = jax.vjp(
            lambda p: sdf_apply(params["sdf"], p, IT, cfg.sdf_model,
                                max_levels=CL)[0], pos)
        (grads_c,) = vjp_fn(jnp.ones_like(sdf_c_2d))
        sdf_c = sdf_c_2d.reshape(-1)
        if where in ("sdf", "both"):
            sdf_c, grads_c = jax.lax.optimization_barrier((sdf_c, grads_c))
        inv_s = vr.variance_inv_s(params["variance"], FV)
        w_c, _, _ = vr.neus_compute_weights(samples, sdf_c, grads_c,
                                            inv_s, COS)
        _, ik = jax.lax.top_k(jnp.where(samples.mask, w_c, -1.0), K)
        flat_ik = (jnp.arange(R)[:, None] * S + ik).reshape(-1)
        sel_mask = jnp.take(samples.mask.reshape(-1), flat_ik)
        return {"samples": samples, "sdf_c": sdf_c.reshape(R, S),
                "grads_c": grads_c.reshape(R, S, 3), "ik": ik,
                "sel_mask": sel_mask.reshape(R, K),
                "pos_k": pos[flat_ik].reshape(R, K, 3),
                "dirs_k": samples.flat_dirs()[flat_ik].reshape(R, K, 3),
                "t_exit": t_exit}

    return lambda: f(params, grid, origins, dirs)


attempt("args_barrier_after_sdf", stage1_barrier("sdf"))
if not results["args_barrier_after_sdf"]["ok"]:
    attempt("args_barrier_after_samples", stage1_barrier("samples"))
    attempt("args_barrier_both", stage1_barrier("both"))

# mlp-const-only variant (tables stay arguments)
mlp_const = params["sdf"]["mlp_sdf"]


@jax.jit
def f_mlpconst(var_enc, var_other, grid, origins, dirs):
    p = {**var_other, "sdf": {"encoding": var_enc, "mlp_sdf": mlp_const}}
    return tps._lod_coarse_select(p, grid, origins, dirs, IT, COS, FV,
                                  cfg=cfg, coarse_levels=CL, top_k=TK)


if not any(results[k]["ok"] for k in results):
    var_other = {k: v for k, v in params.items() if k != "sdf"}
    attempt("const_mlp_only", lambda: f_mlpconst(
        params["sdf"]["encoding"], var_other, grid, origins, dirs))

print(json.dumps(results), flush=True)
