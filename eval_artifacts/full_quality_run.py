"""Full-scale end-metric run (VERDICT r1 item 7).

Trains the FLAGSHIP config (capacity 2^18, 24 levels, full loss set, no
mask supervision => background model active) on the synthetic scene at
200x200 x 24 views, on a schedule compressed 200k -> 30k iters the way the
paper's "~30 min on a 3090" operating point is (~29k iters at 62 ms), then
evaluates with the full protocol:

- PSNR/SSIM/LPIPS on 4 held-out views, FULL-IMAGE (background composited —
  the r1 report was criticized for quoting only the foreground number) and
  foreground-only, both stated;
- Chamfer (DTUeval protocol form: deterministic sampling, radius
  downsample, distance-discard) of the marching-cubes mesh against the
  ANALYTIC scene surface — the synthetic dataset's whole point is that GT
  geometry is exact;
- a sphere-traced test view (the interactive path) saved as PNG.

Artifacts: eval_artifacts/full_quality_run.json + PNGs + checkpoints.
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.ops import occupancy_grid as og
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
CKPT = os.path.join(OUT, "full_run_ckpt")
NR_ITERS = 30000

cfg = tps.PermutoSDFTrainConfig(
    # flagship encoding scale — capacity 2^18, 24 levels (defaults)
    nr_iter_sphere_fit=4000,
    forced_variance_finish_iter=10000,
    iter_start_reduce_curv=12000,
    lr_milestones=(15000, 22000, 27000, 29000),
    iter_finish_training=NR_ITERS,
    sdf_nr_iters_for_c2f=10000,
    with_mask=False,
)

# train views and 4 held-out test views (same generator, different ring)
reel = make_synthetic_reel(nr_views=24, width=200, height=200)
test_reel = make_synthetic_reel(nr_views=4, width=200, height=200,
                                radius=1.25, fov_deg=33.0)

t0 = time.perf_counter()
params, grid, history = tps.train(
    reel, cfg, nr_iters=NR_ITERS, log_every=1000,
    checkpoint_path=CKPT, experiment_name="full", save_every=10000,
)
train_s = time.perf_counter() - t0
print(f"training done in {train_s/60:.1f} min", flush=True)

# ---- image metrics on held-out views ----
from permuto_sdf_tpu.eval.metrics import psnr, ssim, lpips, _lpips_params
import imageio.v2 as imageio

it_anneal = NR_ITERS  # fully annealed
lp = _lpips_params()
rows = []
for i in range(test_reel.nr_images):
    rgb, nrm, alpha = tps.render_image(
        params, grid, test_reel.K[i], test_reel.tf_world_cam[i],
        test_reel.width, test_reel.height, it_anneal, cfg,
    )
    gt = np.asarray(test_reel.rgb[i])
    mask = np.asarray(test_reel.mask[i]) if test_reel.mask is not None else None
    full_psnr = float(psnr(rgb, gt))
    full_ssim = float(ssim(rgb, gt))
    full_lpips = float(lpips(rgb, gt, params=lp))
    row = {"view": i, "psnr_full": full_psnr, "ssim_full": full_ssim,
           "lpips_full": full_lpips}
    if mask is not None:
        m = mask.astype(bool).reshape(gt.shape[0], gt.shape[1])
        mse_fg = float(np.mean((rgb[m] - gt[m]) ** 2)) if m.any() else float("nan")
        row["psnr_foreground"] = float(10 * np.log10(1.0 / max(mse_fg, 1e-12)))
    rows.append(row)
    imageio.imwrite(os.path.join(OUT, f"full_run_view{i}.png"),
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8))
    imageio.imwrite(os.path.join(OUT, f"full_run_view{i}_gt.png"),
                    (np.clip(gt, 0, 1) * 255).astype(np.uint8))
print(json.dumps(rows), flush=True)

# ---- sphere-traced render of view 0 (interactive path) ----
t0 = time.perf_counter()
rgb_st, nrm_st, a_st = tps.render_image_sphere_traced_fast(
    params, grid, test_reel.K[0], test_reel.tf_world_cam[0],
    test_reel.width, test_reel.height, it_anneal, cfg,
    sdf_converged_tresh=1e-3,
)
st_ms = (time.perf_counter() - t0) * 1e3
imageio.imwrite(os.path.join(OUT, "full_run_view0_sphere_traced.png"),
                (np.clip(rgb_st, 0, 1) * 255).astype(np.uint8))
imageio.imwrite(os.path.join(OUT, "full_run_view0_st_normals.png"),
                (np.clip(nrm_st * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8))
st_psnr_fg = None
if test_reel.mask is not None:
    m = np.asarray(test_reel.mask[0]).astype(bool).reshape(200, 200)
    gt0 = np.asarray(test_reel.rgb[0])
    mse = float(np.mean((rgb_st[m] - gt0[m]) ** 2))
    st_psnr_fg = float(10 * np.log10(1.0 / max(mse, 1e-12)))

# ---- geometry: marching cubes vs analytic surface, DTUeval-form chamfer ----
from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn
from permuto_sdf_tpu.eval.chamfer import dtu_chamfer, dtueval_sample_mesh
from permuto_sdf_tpu.models.fields import sdf_apply


@jax.jit
def sdf_fn(pts):
    return sdf_apply(params["sdf"], pts, it_anneal, cfg.sdf_model)[0]


V_pred, F_pred = extract_mesh_from_sdf_fn(sdf_fn, 512, -0.5, 0.5)


@jax.jit
def gt_sdf(pts):
    return syn.scene_sdf(pts)


V_gt, F_gt = extract_mesh_from_sdf_fn(gt_sdf, 512, -0.5, 0.5)
gt_points = dtueval_sample_mesh(V_gt, F_gt, density=0.002)
overall, d2s, s2d = dtu_chamfer(V_pred, F_pred, gt_points,
                                downsample_density=0.002, max_dist=0.05)
print(f"chamfer (scene units): {overall:.6f} (d2s {d2s:.6f}, s2d {s2d:.6f})",
      flush=True)

result = {
    "config": "flagship capacity 2^18 / 24 levels, schedule 200k->30k, no mask",
    "train_minutes": round(train_s / 60, 1),
    "nr_iters": NR_ITERS,
    "image_metrics_per_view": rows,
    "psnr_full_mean": float(np.mean([r["psnr_full"] for r in rows])),
    "ssim_full_mean": float(np.mean([r["ssim_full"] for r in rows])),
    "lpips_full_mean": float(np.mean([r["lpips_full"] for r in rows])),
    "psnr_foreground_mean": float(np.mean(
        [r["psnr_foreground"] for r in rows if "psnr_foreground" in r])),
    "chamfer_scene_units": overall,
    "chamfer_d2s": d2s, "chamfer_s2d": s2d,
    "chamfer_protocol": "DTUeval form: density 0.002, max_dist 0.05, "
                        "GT = analytic scene surface at MC res 512",
    "sphere_traced_view0_ms": round(st_ms),
    "sphere_traced_psnr_foreground": st_psnr_fg,
    "protocol_note": "full-image metrics composite the learned background "
                     "(trained without mask); foreground = GT-mask pixels",
    "pred_mesh": {"V": len(V_pred), "F": len(F_pred)},
}
with open(os.path.join(OUT, "full_quality_run.json"), "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result), flush=True)
