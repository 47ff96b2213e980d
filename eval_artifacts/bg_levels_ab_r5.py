"""Chip A/B: background-field level count (bg_nr_levels) — speed vs
full-image quality in no-mask training.

The NeRF++ bg encode/VJP costs ~57 ms of the 243 ms 1024-ray step
(PERFORMANCE.md finding 30) at the reference's choice of 24 levels for
the bg field (models.py:434-442). The bg renders far-field low-parallax
content, so fewer levels are a candidate lever — but ONLY if the
bg-region PSNR holds (the bench trains no-mask, so this lever moves the
headline number; it must not buy speed with visible bg degradation).

Protocol: no-mask flagship arms at equal iterations on the TEXTURED-bg
synthetic scene (bg_quality_run protocol), metrics fg/full/bg-region
PSNR on held-out views + in-session step timing at 1024 rays.

Smoke: BGAB_SMOKE=1 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python eval_artifacts/bg_levels_ab_r5.py
"""
import sys, os, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
SMOKE = bool(os.environ.get("BGAB_SMOKE"))
NR = int(os.environ.get("BGAB_ITERS", "150" if SMOKE else "3000"))
# shipping-profile knobs (the 2026-08-20 first run used period 3 — later
# REJECTED on quality — and its baseline arm collapsed; the redo runs
# period 2 and the shipping lever-start gate: "auto" = the dataclass
# default (gate at forced_variance_finish_iter for no-mask), "0" = levers
# from iter 0 (the collapsed first-run behavior), else a fraction of NR)
PERIOD = int(os.environ.get("BGAB_PERIOD", "2"))
GATE = os.environ.get("BGAB_GATE", "auto")
OUT_JSON = os.path.join(
    OUT, "bg_levels_ab_r5_smoke.json" if SMOKE else "bg_levels_ab_r5.json")

base = dict(
    nr_iter_sphere_fit=int(NR * 0.17),
    forced_variance_finish_iter=int(NR * 0.375),
    iter_start_reduce_curv=int(NR * 0.46),
    lr_milestones=(int(NR * 0.54), int(NR * 0.71), int(NR * 0.83),
                   int(NR * 0.92)),
    iter_finish_training=NR,
    sdf_nr_iters_for_c2f=int(NR * 0.375),
    with_mask=False, table_grad_alternate=True, train_lod_top_k=24,
    train_lod_rand_extra=8, table_grad_period=PERIOD, hit_ray_frac=1.0,
    **({} if GATE == "auto" else
       {"lever_start_iter": int(NR * float(GATE))}),
)
if SMOKE:
    base.update(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                render_sample_budget=4096, curvature_sample_budget=512,
                grid_nr_random_samples=4096, grid_update_max_levels=6,
                train_lod_top_k=8, sphere_init_points=512)
variants = {"bg24": {}, "bg16": dict(bg_nr_levels=16),
            "bg12": dict(bg_nr_levels=12)}

W = 48 if SMOKE else 200
reel = make_synthetic_reel(nr_views=24, width=W, height=W, bg_mode="textured")
test = make_synthetic_reel(nr_views=2, width=W, height=W, radius=1.25,
                           fov_deg=33.0, bg_mode="textured")

out = {"smoke": SMOKE, "iters": NR, "period": PERIOD, "gate_frac": GATE,
       "per_variant": {}}


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)


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


for name, kw in variants.items():
    cfg = tps.PermutoSDFTrainConfig(**base, **kw)
    t0 = time.perf_counter()
    params, grid, hist = tps.train(reel, cfg, nr_iters=NR, log_every=1000)
    train_s = time.perf_counter() - t0
    rows = []
    for i in range(test.nr_images):
        rgb, _, alpha = tps.render_image(
            params, grid, test.K[i], test.tf_world_cam[i], W, W, NR, cfg)
        gt = np.asarray(test.rgb[i])
        m = np.asarray(test.mask[i]).astype(bool).reshape(W, W)
        rows.append({"view": i, "psnr_full": psnr(rgb, gt),
                     "psnr_fg": psnr(rgb[m], gt[m]),
                     "psnr_bg": psnr(rgb[~m], gt[~m])})
    # in-session step timing at the measured bucket (parity-avg)
    key = jax.random.PRNGKey(2)
    it = jnp.asarray(NR * 4)
    ms = []
    tc = dataclasses.replace(cfg, nr_rays=128 if SMOKE else 1024)
    for parity in range(tc.table_grad_period):
        c = dataclasses.replace(tc, table_grad_parity=parity)
        ms.append(timeit(
            lambda c=c: tps._grads_step(params, grid, reel, key, it, c)[0]))
    res = {
        "train_minutes": round(train_s / 60, 1),
        "step_ms_1024": round(sum(ms) / len(ms), 1),
        "per_view": rows,
        "psnr_full_mean": round(float(np.mean([r["psnr_full"] for r in rows])), 2),
        "psnr_fg_mean": round(float(np.mean([r["psnr_fg"] for r in rows])), 2),
        "psnr_bg_mean": round(float(np.mean([r["psnr_bg"] for r in rows])), 2),
    }
    out["per_variant"][name] = res
    print(name, json.dumps(res), flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)

b24 = out["per_variant"]["bg24"]
for name in ("bg16", "bg12"):
    v = out["per_variant"][name]
    out[f"{name}_deltas"] = {
        "step_ms": round(v["step_ms_1024"] - b24["step_ms_1024"], 1),
        "psnr_full": round(v["psnr_full_mean"] - b24["psnr_full_mean"], 2),
        "psnr_bg": round(v["psnr_bg_mean"] - b24["psnr_bg_mean"], 2),
        "psnr_fg": round(v["psnr_fg_mean"] - b24["psnr_fg_mean"], 2),
    }
with open(OUT_JSON, "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
