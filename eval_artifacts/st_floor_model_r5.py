"""Sphere-trace floor model (VERDICT r4 item 5): from measured per-eval
costs and the algorithm's actual per-round active counts, compute the
best-achievable 1080p frame time on one v5e — and how close the shipped
renderer gets.

Model: the adaptive tracer's work is
    prepass:  R x prepass_jumps       dist-field jumps   (1 gather each)
    round r:  bucket_r x iters        SDF evals at LOD L_r + J jumps
    refine:   bucket_ref x refine_its full-res SDF evals
    shade:    lit x (full-res SDF-with-gradient + RGB + SH/MLP)
Per-eval and per-shade costs are MEASURED in-session on isolated fixed
buckets (pure eval dispatch, no trace orchestration), so the floor is
"if tracing cost nothing but the evals it actually issued". A second,
harder floor prices only the gather INSTANCES at the roofline2 row-2
rate (4.29 ns) — the hardware-issue-rate bound.

Outputs st_floor_model_r5.json: stage counts, measured per-eval rates,
model floor, gather floor, actual frame time, actual/floor ratios, and
the v5e-8 DP projection. BASELINE.md's revised interactive target quotes
this artifact.

Needs eval_artifacts/q20_ckpt (written by quality_20min_r5.py).
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.tensor_reel import (look_at_cam_to_world,
                                                  rays_from_frame)
from permuto_sdf_tpu.ops.sphere_trace import sphere_trace_adaptive, pow2_bucket

OUT = "/root/repo/eval_artifacts"
CKPT_DIR = os.environ.get("ST_CKPT", os.path.join(OUT, "q20_ckpt", "q20"))
# newest iteration subdir
it_dirs = sorted(int(d) for d in os.listdir(CKPT_DIR) if d.isdigit())
CKPT = os.path.join(CKPT_DIR, str(it_dirs[-1]), "models")
print("ckpt:", CKPT, flush=True)

cfg = tps.PermutoSDFTrainConfig()
params, grid = tps.load_from_checkpoint(CKPT, cfg)
dist_field = tps._cached_dist_field(cfg.grid, grid)

W, H = 1920, 1080
f = 0.5 * W / np.tan(np.radians(32.0) / 2)
K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
eye = 1.3 * np.array([np.cos(0.1), 0.35, np.sin(0.1)])
tf = look_at_cam_to_world(eye).astype(np.float32)

LOD_SCHED = (6, 12, 18)
KW = dict(nr_rounds=3, iters_per_round=5, jump_substeps=4, prepass_jumps=16,
          nr_refine_iters=3, lod_schedule=LOD_SCHED)

# ---- 1. actual frame times (cold pass compiles, then warm passes) ----
times = []
for p in range(3):
    t0 = time.perf_counter()
    rgb, nrm, a = tps.render_image_sphere_traced_fast(
        params, grid, K, tf, W, H, 9_999_999, cfg, dist_field=dist_field,
        **KW)
    times.append(round(time.perf_counter() - t0, 2))
    print(f"frame pass {p}: {times[-1]} s", flush=True)
actual_s = float(np.median(times[1:]))

# ---- 2. stage counts from the instrumented tracer (same frame) ----
origins, dirs = rays_from_frame(K, tf, W, H)
n = origins.shape[0]
chunk = min(1 << 21, pow2_bucket(n, lo=256, hi=1 << 21))
pad = (-n) % chunk
origins = jnp.concatenate(
    [origins, jnp.tile(jnp.asarray([[10.0, 0.0, 0.0]]), (pad, 1))], 0)
dirs = jnp.concatenate(
    [dirs, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (pad, 1))], 0)
it = jnp.asarray(9_999_999)
ctx = (params["sdf"], it)
march_eval, refine_eval, refine_ctx, round_evals = tps._make_trace_lod_evals(
    cfg, ctx, 12, LOD_SCHED)
stats = []
lit_total = 0
for i in range(0, n + pad, chunk):
    o, d = origins[i:i + chunk], dirs[i:i + chunk]
    st = []
    pos, sdf, conv, alive, n_alive = sphere_trace_adaptive(
        march_eval, ctx, o, d, tps.BOUND, KW["nr_rounds"],
        KW["iters_per_round"], 0.9, 2e-4, grid_cfg=cfg.grid, grid=grid,
        refine_sdf_eval=refine_eval, refine_ctx=refine_ctx,
        nr_refine_iters=KW["nr_refine_iters"], dist_field=dist_field,
        return_n_hit=True, round_sdf_evals=round_evals, final_refresh=False,
        jump_substeps=KW["jump_substeps"], prepass_jumps=KW["prepass_jumps"],
        stats_out=st,
    )
    lit = tps._lit_and_state(pos, conv, alive, grid, cfg.grid, cfg)
    lit_total += int(jnp.sum(lit))
    stats.append(st)
print("stage stats (chunk 0):", stats[0], "lit:", lit_total, flush=True)

# ---- 3. measured per-eval rates on isolated fixed buckets ----
def timeit(fn, *a, reps=3, ni=5):
    r = fn(*a); jax.block_until_ready(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(ni):
            r = fn(*a)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / ni)
    return best

NB = 1 << 19
pts = jax.random.uniform(jax.random.PRNGKey(0), (NB, 3), minval=-0.4,
                         maxval=0.4)
rates = {}
for name, ev, cx in (("lod6", round_evals[0], ctx),
                     ("lod12", round_evals[1], ctx),
                     ("lod18", round_evals[2], ctx),
                     ("full", refine_eval, refine_ctx)):
    jf = jax.jit(lambda c, p, ev=ev: ev(c, p))
    s = timeit(jf, cx, pts)
    rates[name] = s / NB  # seconds per point-eval
    print(f"{name}: {rates[name]*1e9:.1f} ns/eval", flush=True)

# shade rate: full-res sdf-with-gradient + rgb + SH (the _shade_hits path)
from permuto_sdf_tpu.models.fields import sdf_with_gradient, rgb_apply

@jax.jit
def shade(p, pts, d):
    s, g, geom = sdf_with_gradient(p["sdf"], pts, it, cfg.sdf_model)
    rgb = rgb_apply(p["rgb"], pts, d, g, geom, it, cfg.rgb_model)
    return rgb, g

NS = 1 << 18
d_s = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (NS, 1))
s = timeit(shade, params, pts[:NS], d_s)
rates["shade"] = s / NS
print(f"shade: {rates['shade']*1e9:.1f} ns/ray", flush=True)

# ---- 4. model floors ----
GATHER_NS = 4.29e-9  # roofline2 row-2 measured rate
model_s = 0.0
gather_inst = 0
R_total = n + pad
# prepass jumps (1 gather each; vector cost folded into gather rate)
gather_inst += R_total * KW["prepass_jumps"]
model_s += R_total * KW["prepass_jumps"] * GATHER_NS
stage_rows = []
for st in stats:
    for name, bucket, n_act, n_hit in st:
        if name.startswith("round"):
            rnd = int(name[5:])
            L = LOD_SCHED[rnd]
            evals = bucket * KW["iters_per_round"]
            rate = rates[f"lod{L}"]
        else:
            L = 24
            evals = bucket * KW["nr_refine_iters"]
            rate = rates["full"]
        model_s += evals * rate
        gather_inst += evals * (L * 4 + KW["jump_substeps"])
        stage_rows.append({"stage": name, "bucket": bucket,
                           "active_after": n_act, "hit_after": n_hit,
                           "evals": evals,
                           "model_ms": round(evals * rate * 1e3, 1)})
shade_bucket = pow2_bucket(max(lit_total, 1), lo=256, hi=chunk)
model_s += shade_bucket * rates["shade"]
gather_inst += shade_bucket * (24 * 4 * 3 + 24 * 4)  # grad vjp ~3x fwd + rgb
stage_rows.append({"stage": "shade", "bucket": shade_bucket,
                   "model_ms": round(shade_bucket * rates["shade"] * 1e3, 1)})
gather_floor_s = gather_inst * GATHER_NS

out = {
    "config": KW, "resolution": [W, H], "rays": int(n),
    "actual_warm_frame_s": actual_s, "frame_times": times,
    "per_eval_ns": {k: round(v * 1e9, 1) for k, v in rates.items()},
    "stages": stage_rows,
    "lit_rays": lit_total,
    "model_floor_s": round(model_s, 2),
    "gather_instances_G": round(gather_inst / 1e9, 3),
    "gather_floor_s": round(gather_floor_s, 2),
    "actual_over_model": round(actual_s / model_s, 2),
    "actual_over_gather_floor": round(actual_s / gather_floor_s, 2),
    "v5e8_projection_s": round(model_s / 8 + 0.15, 2),
    "notes": ("model floor = measured isolated per-eval cost x the "
              "algorithm's actual event counts (orchestration-free bound);"
              " gather floor = gather instances x 4.29 ns (roofline2) — "
              "the v5e issue-rate bound. v5e-8 projection = model/8 + "
              "fixed dispatch overhead."),
}
with open(os.path.join(OUT, "st_floor_model_r5.json"), "w") as f_:
    json.dump(out, f_, indent=1)
print(json.dumps(out), flush=True)
