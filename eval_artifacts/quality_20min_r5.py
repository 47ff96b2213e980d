"""TRUE 20-minute time-boxed flagship quality run (VERDICT r4 item 3).

BASELINE.md's time-to-quality row is "scene to reference chamfer <= 20
min". No DTU data exists in this environment (VERDICT missing #3), so
the anchor is the synthetic-scene analog with the full r5 shipping
profile: train the flagship with_mask config for a ~20-minute wall-clock
budget on one v5e chip, then report fg PSNR / mask IoU / DTUeval-form
chamfer against the analytic surface — same protocol as
mask_quality_run.json (68.8 min / 12k iters).

Schedules must be sized at compile time, so the script SELF-SIZES: it
trains at Q20_ITERS (env, default 8000); if the run lands outside
17-23 min it rescales the iteration count by 1200s/actual and trains
once more from scratch, evaluating the attempt closest to 20 min. The
r4 committed artifact was a 2.5-min smoke run mislabeled as the anchor
(VERDICT r4 missing #2) — this writes quality_20min_r5.json only from a
full-scale run, and Q20_SMOKE writes to *_smoke.json.
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
OUT_JSON = os.path.join(
    OUT, "quality_20min_r5_smoke.json" if SMOKE else "quality_20min_r5.json")
BUDGET_S = 1200.0
PERIOD = int(os.environ.get("Q20_PERIOD", "3"))

LEVERS = dict(train_lod_top_k=24, train_lod_rand_extra=8,
              table_grad_alternate=True, table_grad_period=PERIOD,
              hit_ray_frac=1.0)
if SMOKE:
    LEVERS.update(capacity=2 ** 12, nr_levels=8, nr_rays=128,
                  render_sample_budget=4096, curvature_sample_budget=512,
                  grid_nr_random_samples=4096, grid_update_max_levels=6,
                  train_lod_top_k=8, sphere_init_points=512)


def make_cfg(nr_iters):
    return tps.PermutoSDFTrainConfig(
        nr_iter_sphere_fit=int(nr_iters * 0.17),
        forced_variance_finish_iter=int(nr_iters * 0.375),
        iter_start_reduce_curv=int(nr_iters * 0.46),
        lr_milestones=(int(nr_iters * 0.54), int(nr_iters * 0.71),
                       int(nr_iters * 0.83), int(nr_iters * 0.92)),
        iter_finish_training=nr_iters,
        sdf_nr_iters_for_c2f=int(nr_iters * 0.375),
        with_mask=True,
        **LEVERS,
    )


W = 64 if SMOKE else 200
reel = make_synthetic_reel(nr_views=24, width=W, height=W)
test_reel = make_synthetic_reel(nr_views=4, width=W, height=W,
                                radius=1.25, fov_deg=33.0)

NR_ITERS = int(os.environ.get("Q20_ITERS", "300" if SMOKE else "8000"))
attempts = []
for attempt in range(2):
    cfg = make_cfg(NR_ITERS)
    t0 = time.perf_counter()
    params, grid, history = tps.train(
        reel, cfg, nr_iters=NR_ITERS, log_every=1000, experiment_name="q20",
        precompile_ahead=True,
        # final-iter checkpoint: the ST benches need a trained flagship
        # model on disk (checkpoints do not survive rounds — gitignored)
        checkpoint_path=None if SMOKE else os.path.join(OUT, "q20_ckpt"),
        save_every=10 ** 9,
    )
    train_s = time.perf_counter() - t0
    attempts.append({"nr_iters": NR_ITERS,
                     "train_minutes": round(train_s / 60, 2)})
    print(f"attempt {attempt}: {NR_ITERS} iters in {train_s/60:.1f} min",
          flush=True)
    if SMOKE or 17 * 60 <= train_s <= 23 * 60 or attempt == 1:
        break
    NR_ITERS = max(500, int(NR_ITERS * BUDGET_S / train_s / 100) * 100)

from permuto_sdf_tpu.eval.metrics import psnr  # noqa: F401 (parity import)

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
    "smoke": SMOKE,
    "config": ("flagship 2^18/24, with_mask, r5 shipping profile "
               f"(lod24+8, period-{PERIOD} table grads, hit-ray compaction, "
               "isp12/curv8192/grid-lvl14, AOT precompile); "
               "time-boxed to a ~20-min single-chip budget "
               "(BASELINE.md time-to-quality anchor)"),
    "attempts": attempts,
    "train_minutes": attempts[-1]["train_minutes"],
    "nr_iters": NR_ITERS,
    "image_metrics_per_view": rows,
    "psnr_foreground_mean": float(np.mean([r["psnr_foreground"] for r in rows])),
    "mask_iou_mean": float(np.mean([r["mask_iou"] for r in rows])),
    "chamfer_scene_units": overall,
    "chamfer_d2s": d2s, "chamfer_s2d": s2d,
    "pred_mesh": {"V": len(V_pred), "F": len(F_pred)},
    "reference_for_context": {
        "mask_quality_run_69min_r4": "37.3 dB fg / 0.987 IoU / 0.00145 chamfer",
    },
}
with open(OUT_JSON, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result), flush=True)
