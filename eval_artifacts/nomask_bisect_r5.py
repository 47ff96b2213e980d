"""No-mask quality bisect (r5): which lever breaks textured-bg training?

bg_levels_ab_r5's BASELINE arm (bg24: full r5 profile at period 3 +
hitcomp) collapsed to 6.8 dB fg at 3000 iters, while the r4-era
bg_quality_run (NO levers, 2500 iters, same protocol class) reached
27.0 dB fg / 22.6 bg — and none of the r4 lever quality A/Bs covered
the no-mask mode. Bisect arms (2500 iters, textured-bg protocol):

  none     — no levers (r4 bg_quality_run replica; the anchor)
  lod_p2   — train-LOD 24+8 + alternating table grads period 2
             (the r4 shipping profile the bench has been using no-mask)
  lod_p2_hc— + hit-ray compaction (early), the r5 shipping profile

Writes eval_artifacts/nomask_bisect_r5.json.
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
SMOKE = bool(os.environ.get("NB_SMOKE"))
NR = int(os.environ.get("NB_ITERS", "150" if SMOKE else "2500"))
OUT_JSON = os.path.join(
    OUT, "nomask_bisect_r5_smoke.json" if SMOKE else "nomask_bisect_r5.json")

base = dict(
    nr_iter_sphere_fit=int(NR * 0.15),
    forced_variance_finish_iter=int(NR * 0.35),
    iter_start_reduce_curv=int(NR * 0.45),
    lr_milestones=(int(NR * 0.55), int(NR * 0.725), int(NR * 0.825),
                   int(NR * 0.9)),
    iter_finish_training=NR,
    sdf_nr_iters_for_c2f=int(NR * 0.35),
    with_mask=False,
)
if SMOKE:
    base.update(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                render_sample_budget=4096, curvature_sample_budget=512,
                grid_nr_random_samples=4096, grid_update_max_levels=6,
                sphere_init_points=512)
LOD = dict(train_lod_top_k=8 if SMOKE else 24, train_lod_rand_extra=8,
           table_grad_alternate=True, table_grad_period=2)
variants = {
    "none": {},
    # lever_start_iter pinned to 0: these arms measure levers-from-iter-0
    # (the pre-gate shipping behavior; the dataclass default is now AUTO,
    # which would silently gate them)
    "lod_p2": dict(LOD, lever_start_iter=0),
    "lod_p2_hc": dict(LOD, hit_ray_frac=1.0, lever_start_iter=0),
    # the candidate fix: exact step during the fg/bg formation phase
    # (through the cos/variance anneal), levers after
    "lod_p2_hc_gate": dict(LOD, hit_ray_frac=1.0,
                           lever_start_iter=int(NR * 0.35)),
}

W = 48 if SMOKE else 200
reel = make_synthetic_reel(nr_views=24, width=W, height=W, bg_mode="textured")
test = make_synthetic_reel(nr_views=2, width=W, height=W, radius=1.25,
                           fov_deg=33.0, bg_mode="textured")

out = {"smoke": SMOKE, "iters": NR, "per_variant": {}}


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)


for name, kw in variants.items():
    cfg = tps.PermutoSDFTrainConfig(**base, **kw)
    t0 = time.perf_counter()
    params, grid, hist = tps.train(reel, cfg, nr_iters=NR, log_every=500)
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
    res = {
        "train_minutes": round(train_s / 60, 1),
        "per_view": rows,
        "psnr_full_mean": round(float(np.mean([r["psnr_full"] for r in rows])), 2),
        "psnr_fg_mean": round(float(np.mean([r["psnr_fg"] for r in rows])), 2),
        "psnr_bg_mean": round(float(np.mean([r["psnr_bg"] for r in rows])), 2),
        "grid_occupancy": round(float(jnp.mean(grid.occupancy)), 4),
        "final_losses": hist[-3:],
    }
    out["per_variant"][name] = res
    print(name, json.dumps(res), flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
