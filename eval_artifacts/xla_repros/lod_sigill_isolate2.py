"""Round 2 of the LOD stage-1 SIGILL bisection (see lod_sigill_isolate.py).

Round 1 established: full stage 1 crashes, but samples+coarse-sdf and
samples+coarse-grad each compile. The remaining composition points are
bisected here, plus the candidate fix: computing sdf_c and grads_c from
ONE vjp traversal instead of two CSE'd ones (mathematically identical).
"""
import sys, json, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
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
sdf_cfg = cfg.sdf_model
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
    _dump()


def _dump():
    with open("/root/repo/eval_artifacts/xla_repros/"
              "lod_sigill_isolate2.json", "w") as f:
        json.dump(results, f, indent=1)


def make_samples():
    _, t_entry, _, t_exit, _ = tps.BOUND.ray_intersection(origins, dirs)
    samples = tps._create_fg_samples(params, grid, jax.random.PRNGKey(0),
                                     origins, dirs, t_entry, t_exit, IT,
                                     cfg, jitter=False)
    return samples, t_exit


def coarse_two_traversals(pos):
    sdf_c = sdf_apply(params["sdf"], pos, IT, sdf_cfg,
                      max_levels=CL)[0].reshape(-1)
    grads_c = jax.grad(lambda p: sdf_apply(params["sdf"], p, IT, sdf_cfg,
                                           max_levels=CL)[0].sum())(pos)
    return sdf_c, grads_c


def coarse_one_vjp(pos):
    (sdf_c,), vjp_fn = jax.vjp(
        lambda p: (sdf_apply(params["sdf"], p, IT, sdf_cfg,
                             max_levels=CL)[0],), pos)
    (grads_c,) = vjp_fn((jnp.ones_like(sdf_c),))
    return sdf_c.reshape(-1), grads_c


# (a) samples + BOTH coarse sdf and grad (two traversals, as stage 1 has)
def a_both():
    samples, _ = make_samples()
    return coarse_two_traversals(samples.flat_positions())


attempt("samples_plus_sdf_AND_grad", jax.jit(a_both))


# (b) ... + neus weights
def b_weights():
    samples, _ = make_samples()
    sdf_c, grads_c = coarse_two_traversals(samples.flat_positions())
    inv_s = vr.variance_inv_s(params["variance"], FV)
    w_c, _, _ = vr.neus_compute_weights(samples, sdf_c, grads_c, inv_s, COS)
    return w_c


attempt("plus_neus_weights", jax.jit(b_weights))


# (c) ... + top_k + gathers (== full stage 1, known SIGILL; re-confirm)
def c_full():
    return tps._lod_coarse_select(params, grid, origins, dirs, IT, COS, FV,
                                  cfg=cfg, coarse_levels=CL, top_k=TK)


attempt("full_stage1_reconfirm", jax.jit(c_full))


# (d) candidate fix: ONE vjp traversal for sdf_c+grads_c, full stage 1 shape
def d_vjp_stage1():
    samples, t_exit = make_samples()
    R, S = samples.mask.shape
    pos = samples.flat_positions()
    K = min(TK, S)
    sdf_c, grads_c = coarse_one_vjp(pos)
    inv_s = vr.variance_inv_s(params["variance"], FV)
    w_c, _, _ = vr.neus_compute_weights(samples, sdf_c, grads_c, inv_s, COS)
    _, ik = jax.lax.top_k(jnp.where(samples.mask, w_c, -1.0), K)
    flat_ik = (jnp.arange(R)[:, None] * S + ik).reshape(-1)
    sel_mask = jnp.take(samples.mask.reshape(-1), flat_ik)
    return {
        "samples": samples,
        "sdf_c": sdf_c.reshape(R, S),
        "grads_c": grads_c.reshape(R, S, 3),
        "ik": ik,
        "sel_mask": sel_mask.reshape(R, K),
        "pos_k": pos[flat_ik].reshape(R, K, 3),
        "dirs_k": samples.flat_dirs()[flat_ik].reshape(R, K, 3),
        "t_exit": t_exit,
    }


attempt("stage1_vjp_combined", jax.jit(d_vjp_stage1))

# (e) if the vjp stage 1 compiles, check stage 2 consumes it fine
if results.get("stage1_vjp_combined", {}).get("ok"):
    mid = jax.jit(d_vjp_stage1)()
    attempt("stage2_on_vjp_mid", lambda: tps._lod_fine_jit(
        params, mid, origins, dirs, IT, COS, FV, cfg))

# (f) fallback candidate: two traversals but remat barrier on the grad
def f_remat():
    samples, _ = make_samples()
    pos = samples.flat_positions()
    sdf_c = sdf_apply(params["sdf"], pos, IT, sdf_cfg,
                      max_levels=CL)[0].reshape(-1)
    g_fn = jax.checkpoint(lambda p: sdf_apply(params["sdf"], p, IT, sdf_cfg,
                                              max_levels=CL)[0].sum())
    grads_c = jax.grad(g_fn)(pos)
    inv_s = vr.variance_inv_s(params["variance"], FV)
    w_c, _, _ = vr.neus_compute_weights(samples, sdf_c, grads_c, inv_s, COS)
    _, ik = jax.lax.top_k(jnp.where(samples.mask, w_c, -1.0), min(TK, 96))
    return ik


attempt("stage1_remat_grad", jax.jit(f_remat))

print(json.dumps(results), flush=True)
