"""20-minute time-boxed flagship quality run (BASELINE.md target anchor).

BASELINE.md's second target row is "dtu_scan24 to reference Chamfer in
<= 20 min". No DTU data exists in this environment, so the anchor is the
synthetic-scene analog: train the flagship with_mask config (r4 lever
profile + the finding-30 defaults) for a ~20-minute wall-clock budget on
one v5e chip and report fg PSNR / mask IoU / DTUeval-form chamfer
against the analytic surface — the same protocol as
mask_quality_run.json (69 min / 12000 iters), compressed.

The iteration count is pre-scaled (schedule milestones must be fixed at
compile time); the actual wall-clock is reported. Smoke:
Q20_SMOKE=1 env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS='' python ...
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from permuto_sdf_tpu.train import train_permuto_sdf as tps
from permuto_sdf_tpu.datasets import synthetic as syn
from permuto_sdf_tpu.datasets.synthetic import make_synthetic_reel

OUT = "/root/repo/eval_artifacts"
SMOKE = bool(int(os.environ.get("Q20_SMOKE", "0")))
NR_ITERS = 300 if SMOKE else int(os.environ.get("Q20_ITERS", "4000"))

LEVERS = dict(train_lod_top_k=24, train_lod_rand_extra=8,
              table_grad_alternate=True)
if SMOKE:
    LEVERS.update(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                  render_sample_budget=4096, curvature_sample_budget=512,
                  grid_nr_random_samples=4096, grid_update_max_levels=6,
                  train_lod_top_k=8, sphere_init_points=512)

cfg = tps.PermutoSDFTrainConfig(
    nr_iter_sphere_fit=int(NR_ITERS * 0.17),
    forced_variance_finish_iter=int(NR_ITERS * 0.375),
    iter_start_reduce_curv=int(NR_ITERS * 0.46),
    lr_milestones=(int(NR_ITERS * 0.54), int(NR_ITERS * 0.71),
                   int(NR_ITERS * 0.83), int(NR_ITERS * 0.92)),
    iter_finish_training=NR_ITERS,
    sdf_nr_iters_for_c2f=int(NR_ITERS * 0.375),
    with_mask=True,
    **LEVERS,
)

W = 64 if SMOKE else 200
reel = make_synthetic_reel(nr_views=24, width=W, height=W)
test_reel = make_synthetic_reel(nr_views=4, width=W, height=W,
                                radius=1.25, fov_deg=33.0)

t0 = time.perf_counter()
params, grid, history = tps.train(
    reel, cfg, nr_iters=NR_ITERS, log_every=500, experiment_name="q20",
)
train_s = time.perf_counter() - t0
print(f"training done in {train_s/60:.1f} min", flush=True)

from permuto_sdf_tpu.eval.metrics import psnr

it_anneal = NR_ITERS
rows = []
for i in range(2 if SMOKE else test_reel.nr_images):
    rgb, nrm, alpha = tps.render_image(
        params, grid, test_reel.K[i], test_reel.tf_world_cam[i],
        test_reel.width, test_reel.height, it_anneal, cfg,
    )
    gt = np.asarray(test_reel.rgb[i])
    m = np.asarray(test_reel.mask[i]).astype(bool).reshape(gt.shape[:2])
    mse_fg = float(np.mean((rgb[m] - gt[m]) ** 2))
    pred_m = np.asarray(alpha).reshape(gt.shape[:2]) > 0.5
    inter = float(np.logical_and(pred_m, m).sum())
    union = float(np.logical_or(pred_m, m).sum())
    rows.append({
        "view": i,
        "psnr_foreground": float(10 * np.log10(1.0 / max(mse_fg, 1e-12))),
        "mask_iou": inter / max(union, 1.0),
    })
    print(json.dumps(rows[-1]), flush=True)

from permuto_sdf_tpu.ops.marching_cubes import extract_mesh_from_sdf_fn
from permuto_sdf_tpu.eval.chamfer import dtu_chamfer, dtueval_sample_mesh
from permuto_sdf_tpu.models.fields import sdf_apply


@jax.jit
def sdf_fn(pts):
    return sdf_apply(params["sdf"], pts, it_anneal, cfg.sdf_model)[0]


MESH_RES = 64 if SMOKE else 400
V_pred, F_pred = extract_mesh_from_sdf_fn(sdf_fn, MESH_RES, -0.5, 0.5)
V_gt, F_gt = extract_mesh_from_sdf_fn(jax.jit(syn.scene_sdf), MESH_RES, -0.5, 0.5)
gt_points = dtueval_sample_mesh(V_gt, F_gt, density=0.002)
overall, d2s, s2d = dtu_chamfer(V_pred, F_pred, gt_points,
                                downsample_density=0.002, max_dist=0.05)

result = {
    "config": ("flagship 2^18/24, with_mask, r4 lever profile + finding-30 "
               f"defaults (isp12/curv8192/grid-lvl14); {NR_ITERS} iters "
               "sized for a ~20-min single-chip budget "
               "(BASELINE.md time-to-quality target anchor)"),
    "train_minutes": round(train_s / 60, 1),
    "nr_iters": NR_ITERS,
    "image_metrics_per_view": rows,
    "psnr_foreground_mean": float(np.mean([r["psnr_foreground"] for r in rows])),
    "mask_iou_mean": float(np.mean([r["mask_iou"] for r in rows])),
    "chamfer_scene_units": overall,
    "chamfer_d2s": d2s, "chamfer_s2d": s2d,
    "pred_mesh": {"V": len(V_pred), "F": len(F_pred)},
    "reference_for_context": {
        "mask_quality_run_69min": "37.3 dB fg / 0.987 IoU / 0.00145 chamfer",
    },
}
with open(os.path.join(OUT, "quality_20min_r4.json"), "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result), flush=True)
